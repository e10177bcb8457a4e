"""Tuned-config table: override plumbing + autotune candidate validity.

The autotuner (tools/autotune.py) mechanizes the reference's hand-curated
per-GPU config recommendations (reference: bench/README.md:19-27); these
tests cover the dispatcher-side table without needing a chip.
"""

import json

import pytest

from sageattention_tpu.ops import attention_pallas as ap

# heuristic baselines captured with no table installed (module import time
# may already have consulted a packaged table; clear first)
ap.set_tuned_configs(None)
BASE_4K = ap.default_config(4096, 4096, 128, False)
BASE_8K = ap.default_config(8192, 8192, 128, False)
BASE_2K_C = ap.default_config(2048, 2048, 64, True)


@pytest.fixture(autouse=True)
def _clean_table():
    ap.set_tuned_configs(None)
    yield
    ap.set_tuned_configs(None)


def test_override_applies_and_clears():
    key = ap.config_key(4096, 4096, 128, False)
    ap.set_tuned_configs({key: [512, 2048, 128, 2048], "_meta": {"x": 1}})
    assert ap.default_config(4096, 4096, 128, False) == (512, 2048, 128, 2048)
    # shapes absent from the table still fall back to the heuristic
    assert ap.default_config(8192, 8192, 128, False) == BASE_8K
    ap.set_tuned_configs(None)
    assert ap.default_config(4096, 4096, 128, False) == BASE_4K


def test_window_key_lookup_and_fallback():
    """Window-suffixed entries override for that window only; windowed
    lookups without a window entry fall back to the plain-shape entry."""
    wkey = ap.config_key(16384, 16384, 128, True, vt=True, window=4096)
    pkey = ap.config_key(16384, 16384, 128, True, vt=True)
    assert wkey == pkey + ":w4096"
    ap.set_tuned_configs({wkey: [1024, 1024, 256, 256]})
    assert ap.default_config(
        16384, 16384, 128, True, vt=True, window=4096
    ) == (1024, 1024, 256, 256)
    # a different window does NOT hit the w4096 entry (falls back to
    # the heuristic since no plain entry exists either)
    heur = ap.default_config(16384, 16384, 128, True, vt=True)
    assert ap.default_config(
        16384, 16384, 128, True, vt=True, window=2048
    ) == heur
    # plain-shape entry serves windowed lookups when no window entry
    ap.set_tuned_configs({pkey: [2048, 2048, 256, 512]})
    assert ap.default_config(
        16384, 16384, 128, True, vt=True, window=4096
    ) == (2048, 2048, 256, 512)
    ap.set_tuned_configs(None)


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


def test_env_file_load(tmp_path, monkeypatch):
    path = tmp_path / "tuned.json"
    key = ap.config_key(2048, 2048, 64, True)
    path.write_text(json.dumps({key: [1024, 1024, 128, 1024]}))
    monkeypatch.setenv(ap._TUNED_ENV, str(path))
    assert ap.default_config(2048, 2048, 64, True) == (1024, 1024, 128, 1024)
    # the file is read once per process (no hot reload: the fused backward
    # must see the same table its forward traced with); a rewrite only
    # lands after an explicit reset
    path.write_text(json.dumps({key: [2048, 2048, 128, 2048]}))
    assert ap.default_config(2048, 2048, 64, True) == (1024, 1024, 128, 1024)
    ap.set_tuned_configs(None)
    assert ap.default_config(2048, 2048, 64, True) == (2048, 2048, 128, 2048)


def test_five_element_entry_carries_diag_chunk():
    key = ap.config_key(4096, 4096, 128, True)
    ap.set_tuned_configs({key: [2048, 2048, 128, 2048, 512]})
    try:
        assert ap.default_config(4096, 4096, 128, True) == (
            2048, 2048, 128, 2048
        )
        assert ap.default_diag_chunk(4096, 4096, 128, True) == 512
        # a redundant or missing 5th element means "use chunk_k" (None)
        ap.set_tuned_configs({key: [2048, 2048, 128, 2048, 2048]})
        assert ap.default_diag_chunk(4096, 4096, 128, True) is None
        ap.set_tuned_configs({key: [2048, 2048, 128, 2048]})
        assert ap.default_diag_chunk(4096, 4096, 128, True) is None
        # a 5th element that does not divide chunk_k drops the entry
        ap.set_tuned_configs({key: [2048, 2048, 128, 2048, 768]})
        assert ap.default_diag_chunk(4096, 4096, 128, True) is None
    finally:
        ap.set_tuned_configs(None)


def test_malformed_entries_dropped(tmp_path, monkeypatch):
    path = tmp_path / "tuned.json"
    key_bad3 = ap.config_key(2048, 2048, 64, True)
    key_bad_div = ap.config_key(4096, 4096, 128, False)
    key_ok = ap.config_key(8192, 8192, 128, False)
    path.write_text(json.dumps({
        key_bad3: [1024, 1024, 128],          # wrong arity
        key_bad_div: [512, 4096, 128, 3000],  # chunk does not divide block
        key_ok: [512, 8192, 128, 4096],
        "_meta": {"protocol": "x"},
    }))
    monkeypatch.setenv(ap._TUNED_ENV, str(path))
    assert ap.default_config(2048, 2048, 64, True) == BASE_2K_C
    assert ap.default_config(4096, 4096, 128, False) == BASE_4K
    assert ap.default_config(8192, 8192, 128, False) == (512, 8192, 128, 4096)


def _write_packaged(tmp_path, monkeypatch, payload):
    path = tmp_path / "packaged.json"
    path.write_text(json.dumps(payload))
    monkeypatch.delenv(ap._TUNED_ENV, raising=False)
    monkeypatch.setattr(ap, "_TUNED_PACKAGED", str(path))
    return path


def test_packaged_table_device_gate(tmp_path, monkeypatch):
    key = ap.config_key(8192, 8192, 128, False)
    payload = {key: [512, 8192, 128, 4096], "_device": "TPU v5 lite"}
    _write_packaged(tmp_path, monkeypatch, payload)
    # measured on a different generation than the attached device: ignored
    monkeypatch.setattr(ap, "_local_device_kind", lambda: "TPU v4")
    assert ap.default_config(8192, 8192, 128, False) == BASE_8K
    # same generation: applies
    ap.set_tuned_configs(None)
    monkeypatch.setattr(ap, "_local_device_kind", lambda: "TPU v5 lite")
    assert ap.default_config(8192, 8192, 128, False) == (512, 8192, 128, 4096)
    # unknown local device (no backend reachable): trust the table
    ap.set_tuned_configs(None)
    monkeypatch.setattr(ap, "_local_device_kind", lambda: None)
    assert ap.default_config(8192, 8192, 128, False) == (512, 8192, 128, 4096)


def test_packaged_table_without_stamp_applies(tmp_path, monkeypatch):
    # pre-gate tables carry no "_device": keep honoring them
    key = ap.config_key(8192, 8192, 128, False)
    _write_packaged(tmp_path, monkeypatch, {key: [512, 8192, 128, 4096]})
    monkeypatch.setattr(ap, "_local_device_kind", lambda: "TPU v4")
    assert ap.default_config(8192, 8192, 128, False) == (512, 8192, 128, 4096)


def test_env_table_bypasses_device_gate(tmp_path, monkeypatch):
    # an explicitly pointed-at table outranks the gate (user's choice)
    path = tmp_path / "tuned.json"
    key = ap.config_key(8192, 8192, 128, False)
    path.write_text(json.dumps(
        {key: [512, 8192, 128, 4096], "_device": "TPU v5 lite"}
    ))
    monkeypatch.setenv(ap._TUNED_ENV, str(path))
    monkeypatch.setattr(ap, "_local_device_kind", lambda: "TPU v4")
    assert ap.default_config(8192, 8192, 128, False) == (512, 8192, 128, 4096)


def test_missing_file_falls_back(monkeypatch):
    monkeypatch.setenv(ap._TUNED_ENV, "/nonexistent/tuned.json")
    assert ap.default_config(4096, 4096, 128, False) == BASE_4K


def test_candidates_are_valid_and_include_default():
    from tools.autotune import candidates

    for s in (1024, 4096, 32768):
        for d in (64, 128):
            for causal in (False, True):
                cands, heuristic_valid = candidates(s, d, causal)
                assert heuristic_valid
                # candidates carry the diag-chunk 5th element; the
                # first must be the heuristic default (vt-keyed at
                # d <= 64, mirroring bench_one/core dispatch), with
                # dck == ck unless the heuristic itself chunks the
                # diagonal (vt causal)
                vt = d <= 128
                assert cands[0][:4] == ap.default_config(
                    s, s, d, causal, vt=vt)
                dck0 = ap.default_diag_chunk(s, s, d, causal, vt=vt)
                assert cands[0][4] == (dck0 or cands[0][3])
                assert len(cands) == len(set(cands))
                sp = ap._pad128(s)
                for bq, bk, sub, ck, dck in cands:
                    assert bq % 128 == 0 and bk % 128 == 0
                    assert bq % sub == 0
                    assert bk % ck == 0
                    assert ck % dck == 0
                    assert sp % bq == 0 and sp % bk == 0
                    if causal:
                        assert bq == bk  # diagonal-split / fold scheduling
                        assert bk < 4096  # compile-time unroll guard


def test_candidates_never_empty_for_odd_seq():
    from tools.autotune import candidates

    cands, heuristic_valid = candidates(1280, 128, False)
    assert cands  # falls back to the minimal 128-tiling
    sp = ap._pad128(1280)
    for bq, bk, sub, ck, dck in cands:
        assert sp % bq == 0 and sp % bk == 0
