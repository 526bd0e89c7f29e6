"""Prompt syntax: attention weights, edit schedules, alternation, AND.

Behaviour-compatible with the reference's lark-based parser
(modules/prompt_parser.py — `[from:to:when]`, `[x|y]`, `(emph:1.2)`,
`AND`-composition, `BREAK`), implemented as a hand-rolled recursive-descent
parser (no grammar dependency).  Golden cases in tests/test_prompt_parser.py
were produced by running the reference parser.
"""

from __future__ import annotations

import dataclasses
import re
from typing import List


# ==========================================================================
# schedules: [from:to:when], [to:when], [from::when], [a|b|c]
# ==========================================================================

@dataclasses.dataclass
class _Text:
    s: str


@dataclasses.dataclass
class _Seq:
    items: list


@dataclasses.dataclass
class _Sched:
    before: "_Seq"
    after: "_Seq"
    when: float


@dataclasses.dataclass
class _Alt:
    options: list


def _parse_seq(s: str, pos: int, stop_chars: str):
    """Parse until one of stop_chars at this nesting level (or end).

    '(' ... ')' emphasis groups are opaque: ':' and '|' inside them are
    plain text (so ``[a|(b:1.1)]`` alternates over 'a' and '(b:1.1)').
    """
    items = []
    buf = []
    paren_depth = 0
    while pos < len(s):
        ch = s[pos]
        if ch == "(":
            paren_depth += 1
        elif ch == ")" and paren_depth > 0:
            paren_depth -= 1
        elif ch in stop_chars and paren_depth == 0:
            break
        elif paren_depth > 0:
            buf.append(ch)
            pos += 1
            continue
        if ch in "()":
            buf.append(ch)
            pos += 1
            continue
        if ch == "[":
            node, pos2 = _parse_bracket(s, pos + 1)
            if buf:
                items.append(_Text("".join(buf)))
                buf = []
            items.append(node)
            pos = pos2
            continue
        buf.append(ch)
        pos += 1
    if buf:
        items.append(_Text("".join(buf)))
    return _Seq(items), pos


_NUM_RE = re.compile(r"\s*[+-]?(\d+\.?\d*|\.\d+)\s*$")


def _parse_bracket(s: str, pos: int):
    """Parse the inside of '[...'. Returns (node, pos_after_closing)."""
    parts = []       # sequences split by top-level ':' or '|'
    seps = []
    while True:
        seq, pos = _parse_seq(s, pos, ":|]")
        parts.append(seq)
        if pos >= len(s):        # unbalanced: treat what we got
            break
        ch = s[pos]
        pos += 1
        if ch == "]":
            break
        seps.append(ch)

    if seps and all(c == "|" for c in seps):
        return _Alt(parts), pos

    if seps and seps[-1] == ":" and not any(c == "|" for c in seps):
        when_txt = _render_all(parts[-1])
        if _NUM_RE.fullmatch(when_txt):
            when = float(when_txt)
            if len(parts) == 2:          # [to:when] — appears after `when`
                return _Sched(_Seq([]), parts[0], when), pos
            before = parts[0]
            after = _Seq(sum([p.items for p in parts[1:-1]], []))
            return _Sched(before, after, when), pos

    # not a schedule/alternation → literal bracket text
    lit = "[" + _join_literal(parts, seps) + ("]" if pos <= len(s) and s[pos - 1] == "]" else "")
    return _Text(lit), pos


def _join_literal(parts, seps) -> str:
    out = []
    for i, p in enumerate(parts):
        out.append(_render_all(p))
        if i < len(seps):
            out.append(seps[i])
    return "".join(out)


def _render_all(node) -> str:
    """Render ignoring schedules (used to test if a part is a number, and to
    reproduce literal text for non-schedule brackets)."""
    if isinstance(node, _Text):
        return node.s
    if isinstance(node, _Seq):
        return "".join(_render_all(i) for i in node.items)
    if isinstance(node, _Sched):
        return _render_all(node.before) + ":" + _render_all(node.after) + f":{node.when:g}"
    if isinstance(node, _Alt):
        return "|".join(_render_all(o) for o in node.options)
    raise TypeError(node)


def _bound(when: float, steps: int) -> int:
    return int(when * steps) if when < 1 else int(when)


def _collect_steps(node, steps: int, out: set):
    if isinstance(node, _Seq):
        for i in node.items:
            _collect_steps(i, steps, out)
    elif isinstance(node, _Sched):
        b = _bound(node.when, steps)
        if 0 < b < steps:
            out.add(b)
        _collect_steps(node.before, steps, out)
        _collect_steps(node.after, steps, out)
    elif isinstance(node, _Alt):
        out.update(range(1, steps))  # boundary at every step
        for o in node.options:
            _collect_steps(o, steps, out)


def _render_at(node, step: int, steps: int) -> str:
    if isinstance(node, _Text):
        return node.s
    if isinstance(node, _Seq):
        return "".join(_render_at(i, step, steps) for i in node.items)
    if isinstance(node, _Sched):
        chosen = node.before if step <= _bound(node.when, steps) else node.after
        return _render_at(chosen, step, steps)
    if isinstance(node, _Alt):
        opt = node.options[(step - 1) % len(node.options)]
        return _render_at(opt, step, steps)
    raise TypeError(node)


def get_prompt_schedule(prompt: str, steps: int) -> List[list]:
    """[[end_step, prompt_text], ...] — reference
    get_learned_conditioning_prompt_schedules semantics for one prompt."""
    tree, _ = _parse_seq(prompt, 0, "")
    bounds: set = set()
    _collect_steps(tree, steps, bounds)
    keypoints = sorted(bounds) + [steps]
    return [[b, _render_at(tree, b, steps)] for b in keypoints]


def get_prompt_schedules(prompts, steps: int):
    cache = {}
    out = []
    for p in prompts:
        if p not in cache:
            cache[p] = get_prompt_schedule(p, steps)
        out.append(cache[p])
    return out


# ==========================================================================
# attention: (x) (x:1.5) [x] \( BREAK
# ==========================================================================

_ATTN_RE = re.compile(r"""
\\\(|\\\)|\\\[|\\]|\\\\|\\|
\(|\[|:\s*([+-]?[.\d]+)\s*\)|
\)|]|[^\\()\[\]:]+|:
""", re.X)

_BREAK_RE = re.compile(r"\s*\bBREAK\b\s*")


def parse_prompt_attention(text: str) -> List[list]:
    """[[text, weight]] — reference modules/prompt_parser.py:370 semantics."""
    res: List[list] = []
    round_brackets: List[int] = []
    square_brackets: List[int] = []

    round_bracket_multiplier = 1.1
    square_bracket_multiplier = 1 / 1.1

    def multiply_range(start, multiplier):
        for p in range(start, len(res)):
            res[p][1] *= multiplier

    for m in _ATTN_RE.finditer(text):
        tok = m.group(0)
        weight = m.group(1)

        if tok.startswith("\\"):
            res.append([tok[1:], 1.0])
        elif tok == "(":
            round_brackets.append(len(res))
        elif tok == "[":
            square_brackets.append(len(res))
        elif weight is not None and round_brackets:
            multiply_range(round_brackets.pop(), float(weight))
        elif tok == ")" and round_brackets:
            multiply_range(round_brackets.pop(), round_bracket_multiplier)
        elif tok == "]" and square_brackets:
            multiply_range(square_brackets.pop(), square_bracket_multiplier)
        else:
            parts = _BREAK_RE.split(tok)
            for i, part in enumerate(parts):
                if i > 0:
                    res.append(["BREAK", -1])
                if part:
                    res.append([part, 1.0])

    for pos in round_brackets:
        multiply_range(pos, round_bracket_multiplier)
    for pos in square_brackets:
        multiply_range(pos, square_bracket_multiplier)

    if not res:
        res = [["", 1.0]]

    # merge runs with identical weight
    i = 0
    while i + 1 < len(res):
        if res[i][1] == res[i + 1][1] and res[i][0] != "BREAK" and res[i + 1][0] != "BREAK":
            res[i][0] += res[i + 1][0]
            del res[i + 1]
        else:
            i += 1
    return res


# ==========================================================================
# AND composition
# ==========================================================================

_AND_RE = re.compile(r"\bAND\b")
_WEIGHT_RE = re.compile(r"^(.*?)(?:\s*:\s*([-+]?(?:\d+\.?\d*|\.\d+)))?\s*$", re.DOTALL)


@dataclasses.dataclass
class SubPrompt:
    text: str
    weight: float


def split_multicond(prompt: str) -> List[SubPrompt]:
    """'a AND b :0.4' → [SubPrompt('a',1.0), SubPrompt(' b',0.4)]."""
    out = []
    for part in _AND_RE.split(prompt):
        m = _WEIGHT_RE.fullmatch(part)
        text = m.group(1)
        weight = float(m.group(2)) if m.group(2) else 1.0
        out.append(SubPrompt(text, weight))
    return out
