"""Tuned-config table: override plumbing + autotune candidate validity.

The autotuner (tools/autotune.py) mechanizes the reference's hand-curated
per-GPU config recommendations (reference: bench/README.md:19-27); these
tests cover the dispatcher-side table without needing a chip.
"""

import json

import pytest

from sageattention_tpu.ops import attention_pallas as ap


@pytest.fixture(autouse=True)
def _clean_table():
    ap.set_tuned_configs(None)
    yield
    ap.set_tuned_configs(None)


def test_override_applies_and_clears():
    base = ap.default_config(4096, 4096, 128, False)
    key = ap.config_key(4096, 4096, 128, False)
    ap.set_tuned_configs({key: [512, 2048, 128, 2048], "_meta": {"x": 1}})
    assert ap.default_config(4096, 4096, 128, False) == (512, 2048, 128, 2048)
    # other shapes still fall back to the heuristic
    assert ap.default_config(8192, 8192, 128, False) == ap.default_config(
        8192, 8192, 128, False
    )
    ap.set_tuned_configs(None)
    assert ap.default_config(4096, 4096, 128, False) == base


def test_key_is_padded_and_flag_sensitive():
    # 4000 pads to 4096 -> same key as 4096
    assert ap.config_key(4000, 4000, 128, False) == ap.config_key(
        4096, 4096, 128, False
    )
    assert ap.config_key(4096, 4096, 128, True) != ap.config_key(
        4096, 4096, 128, False
    )
    assert ap.config_key(4096, 4096, 128, False, masked=True) != (
        ap.config_key(4096, 4096, 128, False)
    )


def test_env_file_load_and_reload(tmp_path, monkeypatch):
    path = tmp_path / "tuned.json"
    key = ap.config_key(2048, 2048, 64, True)
    path.write_text(json.dumps({key: [1024, 1024, 128, 1024]}))
    monkeypatch.setenv(ap._TUNED_ENV, str(path))
    assert ap.default_config(2048, 2048, 64, True) == (1024, 1024, 128, 1024)
    # rewrite the file -> picked up via mtime without restart
    path.write_text(json.dumps({key: [2048, 2048, 128, 2048]}))
    import os

    os.utime(path, (os.path.getmtime(path) + 5,) * 2)
    assert ap.default_config(2048, 2048, 64, True) == (2048, 2048, 128, 2048)


def test_missing_or_bad_file_falls_back(monkeypatch):
    monkeypatch.setenv(ap._TUNED_ENV, "/nonexistent/tuned.json")
    base = ap.default_config(4096, 4096, 128, False)
    assert base == (1024, 4096, 128, 4096) or len(base) == 4


def test_candidates_are_valid_and_include_default():
    from tools.autotune import candidates

    for s in (1024, 4096, 32768):
        for d in (64, 128):
            for causal in (False, True):
                cands = candidates(s, d, causal)
                assert cands[0] == ap.default_config(s, s, d, causal)
                assert len(cands) == len(set(cands))
                sp = ap._pad128(s)
                for bq, bk, sub, ck in cands:
                    assert bq % 128 == 0 and bk % 128 == 0
                    assert bq % sub == 0
                    assert bk % ck == 0
                    assert sp % bq == 0 and sp % bk == 0
                    if causal:
                        assert bq == bk  # diagonal-split / fold scheduling
                        assert bk < 4096  # compile-time unroll guard
