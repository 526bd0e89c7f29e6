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
