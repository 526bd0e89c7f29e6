"""Golden tests — expected outputs produced by running the reference parser
(modules/prompt_parser.py) directly; our parser must match behaviourally."""

import pytest

from sdwebui_tpu.text.prompt_parser import (
    get_prompt_schedule, parse_prompt_attention, split_multicond,
)


@pytest.mark.parametrize("text,expected", [
    ("normal text", [["normal text", 1.0]]),
    ("an (important) word", [["an ", 1.0], ["important", 1.1], [" word", 1.0]]),
    ("(unbalanced", [["unbalanced", 1.1]]),
    (r"\(literal\]", [["(literal]", 1.0]]),
    ("(unnecessary)(parens)", [["unnecessaryparens", 1.1]]),
    ("a (((house:1.3)) [on] a (hill:0.5), sun, (((sky))).",
     [["a ", 1.0], ["house", 1.5730000000000004], [" ", 1.1], ["on", 1.0],
      [" a ", 1.1], ["hill", 0.55], [", sun, ", 1.1],
      ["sky", 1.4641000000000006], [".", 1.1]]),
    ("a BREAK b", [["a", 1.0], ["BREAK", -1], ["b", 1.0]]),
    ("[low]", [["low", 0.9090909090909091]]),
    ("((x))", [["x", 1.2100000000000002]]),
    ("(x:1.5) and [y] plus (z)",
     [["x", 1.5], [" and ", 1.0], ["y", 0.9090909090909091],
      [" plus ", 1.0], ["z", 1.1]]),
    ("", [["", 1.0]]),
])
def test_parse_prompt_attention_goldens(text, expected):
    got = parse_prompt_attention(text)
    assert len(got) == len(expected)
    for (gt, gw), (et, ew) in zip(got, expected):
        assert gt == et
        assert gw == pytest.approx(ew)


@pytest.mark.parametrize("prompt,steps,expected", [
    ("test", 10, [[10, "test"]]),
    ("a [b:3]", 10, [[3, "a "], [10, "a b"]]),
    ("a [b: 3]", 10, [[3, "a "], [10, "a b"]]),
    ("a [[[b]]:2]", 10, [[2, "a "], [10, "a [[b]]"]]),
    ("[(a:2):3]", 10, [[3, ""], [10, "(a:2)"]]),
    ("a [b : c : 1] d", 10, [[1, "a b  d"], [10, "a  c  d"]]),
    ("a [b:c:0.5] d", 10, [[5, "a b d"], [10, "a c d"]]),
    ("a [b:.5] c", 10, [[5, "a  c"], [10, "a b c"]]),
    ("a [b|c|d] e", 6, [[1, "a b e"], [2, "a c e"], [3, "a d e"],
                        [4, "a b e"], [5, "a c e"], [6, "a d e"]]),
    ("[a|(b:1.1)]", 4, [[1, "a"], [2, "(b:1.1)"], [3, "a"], [4, "(b:1.1)"]]),
    ("[fe|]male", 4, [[1, "female"], [2, "male"], [3, "female"], [4, "male"]]),
    ("a [b::0.4] c", 10, [[4, "a b c"], [10, "a  c"]]),
    ("nested [x[y:0.3]:0.6]", 10, [[3, "nested "], [6, "nested "], [10, "nested xy"]]),
])
def test_prompt_schedule_goldens(prompt, steps, expected):
    assert get_prompt_schedule(prompt, steps) == expected


def test_split_multicond_golden():
    subs = split_multicond("a AND b :0.4 AND c:1.5")
    assert [(s.text, s.weight) for s in subs] == [("a", 1.0), (" b", 0.4), (" c", 1.5)]


def test_split_multicond_no_and():
    subs = split_multicond("just a prompt")
    assert [(s.text, s.weight) for s in subs] == [("just a prompt", 1.0)]


def test_schedule_out_of_range_bound():
    # bound beyond steps: single segment
    assert get_prompt_schedule("a [b:20]", 10) == [[10, "a "]]


def test_strip_comments_matches_reference():
    """# comment stripping (reference processing_scripts/comments.py)."""
    import ast
    import re as _re

    from sdwebui_tpu.text.prompt_parser import strip_comments

    # comments.py imports modules.scripts (gradio) at top level; lift only
    # the pure strip_comments function out of the reference source
    src = open("/root/reference/modules/processing_scripts/comments.py").read()
    tree = ast.parse(src)
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "strip_comments")
    ns = {"re": _re}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)

    class ref:
        strip_comments = staticmethod(ns["strip_comments"])

    for text in ["a cat # fluffy\non a mat",
                 "# whole line\nreal prompt",
                 "no comments at all",
                 "trailing # gone",
                 "a\n# b\nc # d\ne"]:
        assert strip_comments(text) == ref.strip_comments(text), repr(text)


def test_comments_stripped_in_pipeline():
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import _strip_prompt_comments

    p = GenerationParams(prompt="a cat # fluffy", negative_prompt="bad # x")
    p.all_prompts = [p.prompt]
    p.all_negative_prompts = [p.negative_prompt]
    _strip_prompt_comments(p)
    assert "#" not in p.prompt and "fluffy" not in p.prompt
    assert p.all_prompts == [p.prompt]
