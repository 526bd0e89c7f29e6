"""Extensions manager + config states."""

import json
import os

import numpy as np
import pytest

from sdwebui_tpu import extensions as ext_mod
from sdwebui_tpu.utils import config_states
from sdwebui_tpu.utils.options import opts


@pytest.fixture()
def ext_tree(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "extensions" / "my-ext").mkdir(parents=True)
    (tmp_path / "extensions" / "other-ext").mkdir(parents=True)
    (tmp_path / "extensions-builtin" / "shipped").mkdir(parents=True)
    yield tmp_path
    opts.set("disabled_extensions", [])
    opts.set("disable_all_extensions", "none")


def test_discovery_and_disable_policy(ext_tree):
    names = {e.name: e for e in ext_mod.list_extensions()}
    assert set(names) == {"my-ext", "other-ext", "shipped"}
    assert names["shipped"].is_builtin and names["my-ext"].enabled

    opts.set("disabled_extensions", ["my-ext"])
    names = {e.name: e for e in ext_mod.list_extensions()}
    assert not names["my-ext"].enabled and names["other-ext"].enabled

    opts.set("disable_all_extensions", "extra")
    names = {e.name: e for e in ext_mod.list_extensions()}
    assert not names["other-ext"].enabled and names["shipped"].enabled

    opts.set("disable_all_extensions", "all")
    assert all(not e.enabled for e in ext_mod.list_extensions())


def test_config_state_roundtrip(ext_tree):
    opts.set("disabled_extensions", ["other-ext"])
    path = config_states.save_config_state("snap")
    assert os.path.exists(path)
    states = config_states.list_config_states()
    assert states and states[0]["name"] == "snap"
    assert states[0]["extensions"]["other-ext"]["enabled"] is False

    opts.set("disabled_extensions", [])
    restored = config_states.restore_extension_config(states[0])
    assert restored == ["other-ext"]
    assert opts.get("disabled_extensions") == ["other-ext"]


def test_extension_styles_asset(ext_tree):
    (ext_tree / "extensions" / "my-ext" / "styles.csv").write_text(
        "name,prompt,negative_prompt\nextstyle,masterpiece {prompt},bad\n")
    from sdwebui_tpu.text.styles import StyleDatabase

    class FakeEngine:
        styles = StyleDatabase(str(ext_tree / "styles.csv"))
        class sd_model:
            class conditioner:
                embedding_db = None

    loaded = ext_mod.load_extension_assets(FakeEngine)
    assert ("my-ext", "styles") in loaded
    assert "extstyle" in FakeEngine.styles.styles


# --------------------------------------------------------------------------
# policy-gated third-party script execution (reference modules/scripts.py:487)
# --------------------------------------------------------------------------

import shutil
from pathlib import Path

FIXTURE = Path(__file__).parent / "fixtures" / "sample-extension"


@pytest.fixture()
def ext_with_script(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    shutil.copytree(FIXTURE, tmp_path / "extensions" / "sample-extension")
    yield tmp_path
    from sdwebui_tpu.scripts.framework import _SCRIPT_REGISTRY
    _SCRIPT_REGISTRY.pop("sample watermark tag", None)
    opts.set("enable_extension_scripts", False)


def test_extension_scripts_gated_off_by_default(ext_with_script):
    assert ext_mod.load_extension_scripts() == {}
    from sdwebui_tpu.scripts.framework import list_selectable_scripts
    assert "sample watermark tag" not in list_selectable_scripts()


def test_extension_script_loads_and_runs(ext_with_script):
    """Consent on: the fixture extension registers a Script through the
    reference's modules.* API (compat shim) + an image_saved callback, and
    runs through txt2img."""
    import sys

    from sdwebui_tpu.scripts import framework

    opts.set("enable_extension_scripts", True)
    loaded = ext_mod.load_extension_scripts()
    assert loaded == {"sample-extension": ["watermark_tag.py"]}
    assert "sample watermark tag" in framework.list_selectable_scripts()
    # the shim was removed after loading — OUR compat shim is not left
    # installed as 'modules' (an unrelated 'modules' entry — e.g. the
    # reference-oracle test loader's, whose __file__ may be None — is fine)
    mod = sys.modules.get("modules")
    assert mod is None or getattr(mod, "__sdtpu_compat__", False) is False

    # basedir() resolved to the extension path during load
    ext_module = next(m for n, m in sys.modules.items()
                      if n.startswith("sdwebui_ext.sample-extension".replace("-", "_"))
                      or n.startswith("sdwebui_ext.sample_extension"))
    assert "sample-extension" in ext_module.SEEN["basedir"]

    # run it end-to-end through the script framework
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    model = create_tiny_sd(seed=0)
    script = framework.get_script("sample watermark tag")
    p = GenerationParams(prompt="a cat", seed=1, steps=1, width=64,
                         height=64)
    res = script.run(model, p, "tagged-by-ext")
    assert len(res.images) == 1
    assert "Watermark tag: tagged-by-ext" in res.infotexts[0]

    # the registered image_saved callback fires through the channel
    before = ext_module.SEEN["saves"]
    framework.invoke("image_saved", None)
    assert ext_module.SEEN["saves"] == before + 1


def test_topo_sort_requires(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    for name, req in [("b-ext", "a-ext"), ("a-ext", ""), ("c-ext", "b-ext")]:
        d = tmp_path / "extensions" / name
        d.mkdir(parents=True)
        (d / "metadata.ini").write_text(
            f"[Extension]\nRequires = {req}\n")
    order = [e.name for e in ext_mod._topo_sort(ext_mod.list_extensions())]
    assert order.index("a-ext") < order.index("b-ext") < order.index("c-ext")


def test_install_from_local_git(tmp_path, monkeypatch):
    """install_from_url clones a git repo into extensions/ (reference
    ui_extensions.install_extension_from_url; local path stands in for the
    URL in the zero-egress image)."""
    import subprocess

    from sdwebui_tpu.extensions import (check_updates, install_from_url,
                                        list_extensions)

    src = tmp_path / "upstream" / "cool-ext"
    (src / "scripts").mkdir(parents=True)
    (src / "scripts" / "cool.py").write_text("print('hi')\n")
    for cmd in (["git", "init", "-q"],
                ["git", "-c", "user.email=t@t", "-c", "user.name=t",
                 "add", "."],
                ["git", "-c", "user.email=t@t", "-c", "user.name=t",
                 "commit", "-qm", "init"]):
        subprocess.run(cmd, cwd=src, check=True, capture_output=True)

    monkeypatch.chdir(tmp_path)
    ext = install_from_url(str(src))
    assert ext.name == "cool-ext"
    assert (tmp_path / "extensions" / "cool-ext" / "scripts" / "cool.py").exists()
    assert ext.commit_hash

    names = [e.name for e in list_extensions()]
    assert "cool-ext" in names

    # re-install refuses
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        install_from_url(str(src))

    assert check_updates()["cool-ext"] in ("latest", "unknown")


def test_install_rejects_path_traversal(tmp_path, monkeypatch):
    """dirname is a single path component — no escaping extensions/."""
    import pytest as _pytest

    from sdwebui_tpu.extensions import install_from_url

    monkeypatch.chdir(tmp_path)
    for bad in ("../evil", "a/b", "..", ".hidden", "c\\d"):
        with _pytest.raises(ValueError):
            install_from_url("/tmp/whatever", dirname=bad)


# --------------------------------------------------------------------------
# available-extensions index browser (reference ui_extensions.py:407)
# --------------------------------------------------------------------------

INDEX = {
    "tags": {"script": "scripts", "tab": "adds a tab", "ads": "contains ads",
             "localization": "translations"},
    "extensions": [
        {"name": "alpha-tools", "url": "https://x/alpha-tools.git",
         "description": "alpha things", "added": "2023-01-02",
         "tags": ["script"], "stars": 50},
        {"name": "zeta-tab", "url": "https://x/zeta-tab.git",
         "description": "a zeta tab", "added": "2024-06-01",
         "tags": ["tab"], "stars": 900},
        {"name": "ad-thing", "url": "https://x/ad-thing",
         "description": "spam", "added": "2022-01-01", "tags": ["ads"]},
        {"name": "cool-ext", "url": "https://x/cool-ext.git",
         "description": "already installed locally", "added": "2023-05-05",
         "tags": ["script"], "stars": 10},
        {"name": "ja-pack", "url": "https://x/ja.git",
         "description": "japanese localization", "added": "2023-03-03",
         "tags": ["localization"]},
    ],
}


@pytest.fixture()
def index_file(tmp_path, monkeypatch):
    import json

    from sdwebui_tpu import extensions as ext_mod

    monkeypatch.chdir(tmp_path)
    os.makedirs("extensions/cool-ext")  # installed by dir name
    p = tmp_path / "index.json"
    p.write_text(json.dumps(INDEX))
    monkeypatch.setattr(ext_mod, "_available_index", None)
    return str(p)


def test_browse_available_filters(index_file):
    from sdwebui_tpu.extensions import browse_available, load_available_index

    load_available_index(index_file)
    # defaults: ads + localization + installed hidden
    got = browse_available()
    names = [e["name"] for e in got["extensions"]]
    assert "ad-thing" not in names and "ja-pack" not in names
    assert "cool-ext" not in names           # installed, hidden by default
    assert {"alpha-tools", "zeta-tab"} <= set(names)
    assert got["hidden"] == 3
    assert got["tags"]["script"] == "scripts"

    # newest-first default ordering (sort_column 0: 'added' desc)
    assert names.index("zeta-tab") < names.index("alpha-tools")
    # a-z
    az = [e["name"] for e in
          browse_available(sort_column=2)["extensions"]]
    assert az == sorted(az)
    # stars desc
    st = browse_available(sort_column=7)["extensions"]
    assert st[0]["name"] == "zeta-tab"

    # tag whitelist
    only_tab = browse_available(selected_tags=["tab"])["extensions"]
    assert [e["name"] for e in only_tab] == ["zeta-tab"]
    # search over name+description
    hit = browse_available(filter_text="alpha things")["extensions"]
    assert [e["name"] for e in hit] == ["alpha-tools"]
    # show installed: the installed flag is set
    allx = browse_available(hide_installed=False)["extensions"]
    cool = next(e for e in allx if e["name"] == "cool-ext")
    assert cool["installed"] is True


def test_browse_available_requires_index(monkeypatch):
    from sdwebui_tpu import extensions as ext_mod

    monkeypatch.setattr(ext_mod, "_available_index", None)
    with pytest.raises(ValueError):
        ext_mod.browse_available()


def test_available_endpoint(index_file):
    """API surface: POST /internal/extensions/available with a local index
    path (zero-egress friendly), then re-filter without refetching."""
    from sdwebui_tpu.server.api import Api, ApiError

    class _Eng:
        def __getattr__(self, k):
            raise AttributeError(k)

    api = Api.__new__(Api)
    got = api.extensions_available({"url": index_file, "refresh": True})
    assert {"alpha-tools", "zeta-tab"} <= {e["name"] for e in got["extensions"]}
    got2 = api.extensions_available({"search": "zeta"})
    assert [e["name"] for e in got2["extensions"]] == ["zeta-tab"]
    with pytest.raises(ApiError):
        api.extensions_available({"url": "/no/such/index.json",
                                  "refresh": True})
