#!/usr/bin/env python
"""On-chip kernel-config autotuner.

Sweeps valid (block_q, block_k, sub_q, chunk_k) candidates for the fused
attention kernel on the attached TPU and persists the winners as a JSON
table that ``attention_pallas.default_config`` consults (see
``set_tuned_configs`` there).  This mechanizes the reference's hand-curated
per-GPU recommended-config table (reference: bench/README.md:19-27) — the
reference ships prose ("use pv_accum_dtype=fp32+fp16 on RTX4090"); here the
table is measured on the actual device and read back by the dispatcher.

Usage:
    python tools/autotune.py                      # default sweep -> stdout
    python tools/autotune.py --out tuned.json     # persist
    python tools/autotune.py --apply              # write the packaged table
    python tools/autotune.py --seqs 4096,16384 --head_dims 128 --causal both

Each candidate costs a fresh Mosaic compile (20-40 s on first run), so the
candidate generator is deliberately small: it encodes the measured shape
rules (chunks >= 1024 lanes, causal bq == bk, no 4096x4096 causal unrolls)
and sweeps only the knobs that measured as load-bearing in rounds 1-2
(block_k / chunk width; block_q at short seq).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sageattention_tpu.ops.attention_pallas import (  # noqa: E402
    _pad128,
    config_key,
    default_config,
    default_diag_chunk,
)


def candidates(s: int, d: int, causal: bool, window: int | None = None):
    """Valid configs to try for a square (s, s, d) shape.  Returns
    ``(configs, heuristic_valid)``: a list of (block_q, block_k, sub_q,
    chunk_k) tuples — the heuristic default first when it is itself a
    valid dividing config (so ties keep the current behavior) — and
    whether it was.  d <= 128 sweeps the transposed-formulation (vt)
    knobs, matching bench_one's dispatch."""
    sp = _pad128(s)
    vt = d <= 128
    seen = set()

    def emit(bq, bk, sub, ck, dck=None):
        bq, bk = min(bq, sp), min(bk, sp)
        ck = min(ck, bk)
        dck = min(dck, ck) if dck else ck
        cfg = (bq, bk, sub, ck, dck)
        if (
            bq % 128 or bk % 128 or ck % 128 or dck % 128
            or bq % sub
            or bk % ck
            or ck % dck
            or sp % bk
            or sp % bq
            or cfg in seen
        ):
            return
        seen.add(cfg)
        yield_list.append(cfg)

    yield_list: list[tuple[int, int, int, int, int]] = []
    emit(*default_config(s, s, d, causal, vt=vt, window=window),
         dck=default_diag_chunk(s, s, d, causal, vt=vt, window=window))
    heuristic_valid = bool(yield_list)
    if window is not None:
        # sliding-window band shapes (causal only): the band grid wants
        # block == window-dividing tiles (block-aligned static edges) and
        # the vt narrow chunks; sweep the block/chunk pair around them
        for blk in (1024, 2048):
            if window % blk:
                continue
            for sub in (128, 256):
                for ck in (256, 512, blk):
                    emit(blk, blk, sub, ck)
    elif vt and causal:
        # r4 retune: narrow chunks dominate the transposed kernel; the
        # chunk width is the load-bearing knob, sub-tile width second
        for blk in (1024, 2048):
            for sub in (128, 256):
                for ck in (256, 512, blk):
                    emit(blk, blk, sub, ck)
    elif vt:
        if sp <= 4096:
            for bq in (1024, 4096):
                for sub in (128, 256):
                    for ck in (256, 512):
                        emit(min(bq, sp), sp, sub, ck)
        else:
            for bk in (16384,):
                for ck in (256, 512, 1024):
                    for sub in (128, 256):
                        emit(1024, min(bk, sp), sub, ck)
    elif causal:
        # equal Q/KV blocks ride the diagonal-split (and fold) scheduling;
        # 4096 explodes Mosaic compile time (measured >9 min) — never try.
        # The diagonal chunk (dck < ck) trades VPU-efficient wide chunks
        # for trace-time skipping of above-diagonal work items in the
        # diagonal block — the dominant waste at small causal grids.
        for blk in (1024, 2048):
            for dck in (blk, blk // 2, blk // 4):
                if dck >= 256:
                    emit(blk, blk, 128, blk, dck)
    else:
        for bq in (512, 1024):
            for bk in (sp, 16384, 8192, 4096):
                if bk > sp:
                    continue
                if bk <= 4096:
                    cks = (bk,)
                else:
                    cks = tuple(
                        ck for ck in (4096, 8192, bk // 2)
                        if 1024 <= ck <= 8192 and bk % ck == 0
                    )
                for ck in cks:
                    emit(bq, bk, 128, ck)
                    # wider sub-tiles amortize per-item VPU overheads at
                    # d=64 (half the MACs per score element); round-3 knob
                    if d <= 64 and bq >= 512:
                        emit(bq, bk, 256, cks[0])
    if not yield_list:
        # e.g. non-power-of-two seqs whose pad128 none of the swept blocks
        # divide: fall back to the always-valid minimal tiling so the
        # sweep still records a runnable config
        emit(128, 128, 128, 128)
    return yield_list, heuristic_valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head_dims", default="64,128")
    ap.add_argument("--seqs", default="1024,4096,8192,16384,32768")
    ap.add_argument("--causal", default="both",
                    choices=["both", "true", "false"])
    ap.add_argument("--pv_dtype", default="bf16",
                    choices=["int8", "bf16", "fp8"],
                    help="V storage dtype to tune under (bf16 = the "
                         "sageattn auto default)")
    ap.add_argument("--out", default="",
                    help="write the tuned table to this JSON path")
    ap.add_argument("--apply", action="store_true",
                    help="write to the packaged table "
                         "sageattention_tpu/data/tuned_configs.json")
    ap.add_argument("--min_gain", type=float, default=0.02,
                    help="only record a non-default winner if it beats the "
                         "heuristic default by this fraction")
    ap.add_argument("--window", type=int, default=0,
                    help="sweep sliding-window (causal band) shapes with "
                         "this window width instead of full attention; "
                         "winners get window-suffixed keys")
    args = ap.parse_args()
    window = args.window or None
    if window:
        args.causal = "true"  # windows require causal

    # imported late: jax initializes the backend on import of bench utils
    from bench.bench_kernel import bench_one

    from sageattention_tpu.ops.attention_pallas import set_tuned_configs

    # Bypass any persisted tuned table for this process: the "heuristic
    # default" baseline must be the RAW heuristic, not a previously
    # persisted winner — otherwise a re-run sees its own past winner as
    # "default", records "heuristic kept", and --apply silently drops
    # the entry, regressing production dispatch.
    set_tuned_configs({})

    causals = {"both": (False, True), "true": (True,),
               "false": (False,)}[args.causal]
    # carry forward previously persisted entries for shapes outside this
    # sweep; swept shapes are re-decided below (including removal when
    # the heuristic wins again)
    table: dict[str, list[int]] = {}
    pkg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sageattention_tpu", "data", "tuned_configs.json",
    )
    prior_confirmed: set[str] = set()
    for prior in (args.out, pkg_path if args.apply else ""):
        if prior and os.path.exists(prior):
            with open(prior) as f:
                raw_prior = json.load(f)
            table.update({
                k: v for k, v in raw_prior.items()
                if not k.startswith("_")
            })
            # carry confirmed-optimal records for shapes OUTSIDE this
            # sweep (an hd128-only re-sweep must not erase the hd64
            # confirmations — the r4 table lost exactly those)
            meta_prior = raw_prior.get("_meta") or {}
            prior_confirmed = set(meta_prior.get("confirmed_optimal", []))
            break
    report = []
    for d in (int(x) for x in args.head_dims.split(",")):
        for s in (int(x) for x in args.seqs.split(",")):
            for causal in causals:
                cands, heuristic_valid = candidates(s, d, causal, window)
                default = cands[0] if heuristic_valid else None
                best, best_t, default_t = None, float("inf"), None
                for cfg in cands:
                    bq, bk, sub, ck, dck = cfg
                    t0 = time.time()
                    try:
                        tops, t = bench_one(
                            args.batch, args.heads, s, d,
                            causal=causal, pv_dtype=args.pv_dtype,
                            quant_gran="auto",
                            block_q=bq, block_k=bk, chunk_k=ck, sub_q=sub,
                            diag_chunk_k=dck, window=window,
                        )
                    except Exception as e:  # OOM / Mosaic reject: skip
                        print(f"  s={s} d={d} causal={causal} {cfg}: "
                              f"FAILED {type(e).__name__}: {e}",
                              file=sys.stderr, flush=True)
                        continue
                    print(f"  s={s} d={d} causal={causal} {cfg}: "
                          f"{t*1e3:8.3f} ms {tops:7.1f} TOPS "
                          f"(wall {time.time()-t0:.0f}s)",
                          file=sys.stderr, flush=True)
                    if cfg == default:
                        default_t = t
                    if t < best_t:
                        best, best_t = cfg, t
                if best is None:
                    continue
                key = config_key(s, s, d, causal, vt=d <= 128,
                                 window=window)
                def _trim(cfg):
                    # drop a redundant 5th element (dck == ck) so plain
                    # 4-element entries stay the common case
                    return list(cfg[:4]) if cfg[4] == cfg[3] else list(cfg)

                if default_t is None:
                    # the heuristic default failed to bench (or was not a
                    # valid candidate for this shape): ALWAYS persist the
                    # measured winner — production would otherwise keep
                    # dispatching a config that just failed here
                    table[key] = _trim(best)
                    report.append((key, best, float("nan")))
                    continue
                gain = (default_t - best_t) / default_t
                if best != default and gain >= args.min_gain:
                    table[key] = _trim(best)
                    report.append((key, best, gain))
                else:
                    # heuristic wins for this shape now: drop any stale
                    # carried-forward entry so dispatch uses the heuristic
                    table.pop(key, None)
                    report.append((key, default, 0.0))

    print("# autotune summary", file=sys.stderr)
    for key, cfg, gain in report:
        if gain != gain:  # NaN: heuristic default itself failed to run
            tag = "heuristic FAILED; winner persisted"
        elif gain:
            tag = f"+{gain*100:.1f}% over heuristic"
        else:
            tag = "heuristic kept"
        print(f"  {key}: {cfg}  ({tag})", file=sys.stderr)

    out = dict(table)
    # Stamp the device generation the winners were measured on: the
    # packaged-table loader ignores a table tuned on a different TPU
    # generation (attention_pallas._load_tuned), since block-size winners
    # encode that generation's VMEM/MXU balance.
    import jax

    out["_device"] = jax.devices()[0].device_kind
    out["_meta"] = {
        "protocol": f"b={args.batch} h={args.heads} pv={args.pv_dtype} "
                    "two-point-slope device_time",
        "min_gain": args.min_gain,
        # shapes where the heuristic default beat (or tied, within
        # min_gain) every swept candidate — the sweep's record that the
        # built-in config is confirmed optimal there, not merely
        # untested.  Prior confirmations for shapes outside this sweep
        # carry forward (re-decided when re-swept).
        "confirmed_optimal": sorted(
            (prior_confirmed - {key for key, _, _ in report})
            | {key for key, _, gain in report if gain == 0.0}
        ),
    }
    text = json.dumps(out, indent=1, sort_keys=True)
    print(text)
    paths = []
    if args.out:
        paths.append(args.out)
    if args.apply:
        pkg = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "sageattention_tpu", "data")
        os.makedirs(pkg, exist_ok=True)
        paths.append(os.path.join(pkg, "tuned_configs.json"))
    for p in paths:
        with open(p, "w") as f:
            f.write(text + "\n")
        print(f"# wrote {p}", file=sys.stderr)


if __name__ == "__main__":
    main()
