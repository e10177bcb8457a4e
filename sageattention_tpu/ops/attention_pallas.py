"""Fused SageAttention kernel for TPU (Pallas / Mosaic).

One parameterized kernel family replaces the reference's per-arch CUDA/HIP/
Triton kernel zoo (reference: csrc/qattn/qk_int_sv_f8_cuda_sm89.cuh:46-706,
qk_int_sv_f16_cuda_sm80.cu, triton/attn_qk_int8_*.py).  Static configuration
(head_dim, causal, V storage dtype, LSE, GQA group, segments) is resolved at
trace time; Mosaic targets every TPU generation, so there is no arch dispatch
matrix (reference: csrc/dispatch_utils.h).

Architecture — measured-on-TPU redesign of the reference's fused form
(SURVEY.md §3.2), shaped by three facts of this hardware that differ from
CUDA tensor cores:

1. MXU matmul rooflines (measured, 8192^3): bf16 178, int8 343 (1.93x),
   int4 725 (3.9x) TFLOPS/TOPS; fp8 e4m3 = 174 == bf16 (NO native fp8 on
   this generation — fp8 V is storage compression only).
2. The kernel is jointly MXU- and VPU-bound: the online-softmax VPU work is
   comparable to the matmul time, so the win comes from *overlapping* them.
   Because the VPU side binds, the faster low-bit MXU rates only pay where
   they displace MXU time that is NOT hidden: int8 QK^T wins; casting QK
   operands to int4 in-register (``qk_int4``, 2x MXU) measures as a no-op
   on the full kernel, and requantizing P to int8 for PV
   (``pv_compute='int8'``) is a measured 35% LOSS — the quantize +
   relayout VPU pass on the [sub, chunk] tile costs more than the faster
   MXU saves (134 vs 205 TOPS at 4k/hd128).  Both paths are kept,
   measured and documented, as the honest answer to the reference's
   low-bit PV matrix (reference: csrc/mma.cuh:429-527 s4s4s32,
   attn_utils.cuh:777-992 compute_fp8_sv).
3. Cross-lane reductions and elementwise passes over the score tile dominate
   VPU time; transcendentals (exp2) fuse into the dequant chain nearly free.

Hence the kernel structure (measured +55% over the naive fused loop, +30%
over jax's flash_attention on the reference's headline shape):

* grid = (batch, q_heads, q_blocks, kv_blocks); the kv dimension is the
  online-softmax reduction ("arbitrary"); the Pallas grid pipeline
  double-buffers the K/V block DMAs (the TPU analogue of cp.async staging,
  reference: csrc/cp_async.cuh).
* Each Q block is split into independent **sub-tile chains** (default 128
  rows) and each KV block into **chunks** (default 2048 columns).  The
  (sub-tile x chunk) work items are software-pipelined: the INT8 QK^T MXU
  op of item t+1 is issued before the softmax VPU work of item t, and the
  items' dependency chains are mutually independent, giving Mosaic's
  scheduler the slack to keep the MXU and VPU busy simultaneously — the
  TPU version of warp specialization.
* Q.K^T is int8 x int8 -> int32 on the MXU (reference: csrc/mma.cuh:329-427
  s8s8s32).  Per-chunk dequant scale = q_scale (per row, sm_scale*log2e
  folded, reference: quant.py:95) x k_scale (one SMEM scalar per chunk), so
  the row max commutes to the int32 domain and dequantization reaches the
  VPU as a single fused multiply feeding exp2 — the reference's folded-
  dequant ``update_mdo`` online softmax (reference: attn_utils.cuh:353-458)
  with the lane shuffles replaced by VPU cross-lane reductions.
* **Split softmax**: each work item computes an independent (m_c, l_c,
  p_c.V_c) triple; exact LSE-weighted merging happens once per sub-tile at
  the end of the KV block, then once more into the running (m, l, acc)
  scratch carried across KV blocks.  Removing the serial rescale-per-chunk
  dependency of the classic online loop is what unlocks the MXU/VPU overlap.
* P stays **bf16** for the P.V MXU op by default: quantizing P (the
  reference's S_FP8_OFFSET trick, attn_utils.cuh:30-32) costs a VPU
  quantize + relayout pass that outweighs the 1.9x int8 MXU rate
  (measured; see fact 2 above — ``pv_compute='int8'`` implements it for
  the record).  V may be stored int8 / fp8 (per-channel scales, converted
  to bf16 in-register) or bf16; the per-channel v_scale multiply and
  v_mean add stay fused in the epilogue (reference: sm89.cuh:578-624).
* Causal: KV blocks strictly above the diagonal are skipped via clamped
  index maps — no DMA and no compute (reference early-exit:
  sm89.cuh:225-229); diagonal blocks mask per-chunk in the int32 domain.
* Varlen is segment-id masking (splash-attention idiom) rather than
  cu_seqlens pointer chasing (reference: triton/attn_qk_int8_block_
  varlen.py) — same capability, TPU-idiomatic form.
* LSE output is base-2 ``log2(l) + m`` exactly as the reference kernel
  stores it (reference: sm89.cuh:694-706).
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NEG_INIT = -1e30  # finite m initializer: exp2(NEG_INIT - m) == 0 exactly
MIN_LANES = 128
# int32-domain mask value for raw QK^T scores in the fast path; scaled by a
# positive dequant scale it stays hugely negative.
MASK_I32 = -(2**30)
# Default KV chunk width of the in-kernel pipeline.  Chunks narrower than
# ~1024 lanes are VPU-inefficient (measured); 2048 balances VMEM footprint
# against pipeline depth.
DEFAULT_CHUNK_K = 2048


def effective_chunk_k(block_k: int) -> int:
    """The kernel's KV chunk width for a given KV block size.  The chunked
    (fast-path) K quantization group in quant.py must equal this."""
    if block_k <= 4096:
        return block_k
    return max(4096, min(8192, block_k // 2))


def _pad128(n: int) -> int:
    return max(128, -(-n // 128) * 128)


def vt_eligible_head_dim(d: int) -> bool:
    """True when head_dim (after core.py's 64/128-multiple padding) fits
    the transposed (vt) formulation.  core._entry's ``vt_hint`` and the
    fused backward's K-quant-group derivation (attention_bwd_pallas) both
    gate on THIS helper so the forward quantizer's chunk width and the
    backward's ``scale_group`` can never silently desynchronize (the two
    hand-duplicated gates were the r4 advisor's finding)."""
    d_pad = 64 if d <= 64 else -(-d // 128) * 128
    return d_pad <= 128


# --- tuned-config table (autotuner override) -------------------------------
#
# ``tools/autotune.py`` sweeps kernel configs on the real chip and persists
# the winners; ``default_config`` consults that table before falling back to
# the built-in heuristic.  This is the TPU analogue of the reference's
# per-GPU recommended-config table (reference: bench/README.md:19-27) except
# machine-generated and machine-read.  Lookup order:
#   1. a table installed programmatically via :func:`set_tuned_configs`,
#   2. a JSON file named by ``$SAGE_TUNED_CONFIGS``,
#   3. the packaged ``sageattention_tpu/data/tuned_configs.json`` (if built).
# Keys are ``"<pad128(sq)>:<pad128(sk)>:<d>:<causal>:<masked>"``; values are
# ``[block_q, block_k, sub_q, chunk_k]``.

_TUNED_ENV = "SAGE_TUNED_CONFIGS"
_TUNED_PACKAGED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "tuned_configs.json",
)
_tuned_table: dict | None = None
_tuned_loaded_from: str | None = None


def config_key(
    sq: int, sk: int, d: int, is_causal: bool, masked: bool = False,
    vt: bool = False, window: int | None = None,
) -> str:
    """The tuned-table key for a shape (padded-seq granularity).  ``vt``
    keys the transposed-formulation dispatch (d <= 128, core.py): its
    block-size winners differ from the normal orientation's, and a shape
    can run either depending on runtime features (masks disable vt).
    ``window`` (sliding-window width) appends a ``:w<N>`` suffix — band
    grids have their own block/chunk winners (r4 measured the window
    metric 1.64x low because it ran full-causal configs)."""
    base = (
        f"{_pad128(sq)}:{_pad128(sk)}:{d}:"
        f"{int(bool(is_causal))}:{int(bool(masked))}:{int(bool(vt))}"
    )
    if window:
        base += f":w{int(window)}"
    return base


def _parse_table(raw: dict) -> dict:
    """Validate raw JSON entries; malformed entries are dropped (a bad
    config must not reach the Mosaic compiler or desynchronize the fused
    backward's K-quant group from the forward's)."""
    table = {}
    for k, v in raw.items():
        if k.startswith("_"):
            continue
        if k.count(":") == 4:
            # legacy 5-field key (pre-vt tables, e.g. a user's
            # $SAGE_TUNED_CONFIGS from an earlier autotune run): those
            # winners were measured on the normal orientation -> vt=0
            k = k + ":0"
        elif k.count(":") not in (5, 6):  # 6 = window-suffixed keys
            continue
        try:
            vals = [int(x) for x in v]
        except (TypeError, ValueError):
            continue
        if len(vals) == 4:
            bq, bk, sub, ck = vals
            dck = ck
        elif len(vals) == 5:
            # optional 5th element: the causal diagonal region's chunk
            # width (diag_chunk_k) — must divide the quant group ck
            bq, bk, sub, ck, dck = vals
        else:
            continue
        if (
            min(bq, bk, sub, ck, dck) <= 0
            or bq % 128 or bk % 128
            or bq % sub or bk % ck or ck % dck
        ):
            continue
        table[k] = (bq, bk, sub, ck, dck)
    return table


def set_tuned_configs(table: dict | str | None) -> None:
    """Install (dict or JSON path) — or clear (None) — the tuned-config
    override table used by :func:`default_config`.

    Do NOT swap tables while a traced computation is mid-flight: the fused
    backward re-derives its K-quantization group from ``default_config``,
    so the table must be identical when a forward and its backward trace.
    (For the same reason the env/packaged file is read once per process,
    not hot-reloaded.)"""
    global _tuned_table, _tuned_loaded_from
    if table is None:
        _tuned_table = None
        _tuned_loaded_from = None
        return
    if isinstance(table, str):
        with open(table) as f:
            table = json.load(f)
    _tuned_table = _parse_table(table)
    _tuned_loaded_from = "<set_tuned_configs>"


def _local_device_kind() -> str | None:
    """The attached accelerator's device kind (e.g. "TPU v5 lite"), or
    None when no backend is reachable.  Deliberately lazy: importing this
    module must not initialize a backend."""
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:
        return None


def _load_tuned() -> dict:
    """The active tuned table (loaded once per process per source path).

    The PACKAGED table is device-gated: ``tools/autotune.py`` stamps the
    device kind it measured on into ``"_device"``, and a packaged table
    measured on a different TPU generation is ignored (its block-size
    winners encode that generation's VMEM/MXU balance).  A table the user
    points at explicitly via ``$SAGE_TUNED_CONFIGS`` or installs via
    :func:`set_tuned_configs` always applies — an explicit choice
    outranks the gate."""
    global _tuned_table, _tuned_loaded_from
    if _tuned_loaded_from == "<set_tuned_configs>":
        return _tuned_table or {}
    env_path = os.environ.get(_TUNED_ENV)
    path = env_path or _TUNED_PACKAGED
    if _tuned_loaded_from != path:
        try:
            with open(path) as f:
                raw = json.load(f)
            tuned_for = raw.get("_device") if isinstance(raw, dict) else None
            if not env_path and tuned_for:
                local = _local_device_kind()
                if local is not None and local != tuned_for:
                    raw = {}
            _tuned_table = _parse_table(raw)
        except (OSError, ValueError):
            _tuned_table = {}
        _tuned_loaded_from = path
    return _tuned_table or {}


def default_config(
    sq: int, sk: int, d: int, is_causal: bool, masked: bool = False,
    vt: bool = False, window: int | None = None,
) -> tuple[int, int, int, int]:
    """Tuned (block_q, block_k, sub_q, chunk_k) for a shape (measured on
    TPU v5e; the single recommended-config table that replaces the
    reference's per-GPU recommendations, reference: bench/README.md:22-27).

    Round-2 retune: the 16 MB scoped-vmem ceiling the round-1 configs were
    tuned under is only the compiler's default limit — the chip runs 120 MB
    of VMEM scratch fine (measured), so the kernel now raises
    ``vmem_limit_bytes`` and the sweet spot moved to much bigger tiles:

    * Non-causal: whole-KV single-step up to 32k (no online-softmax state,
      no scratch round-trips), 1024-row Q blocks, 128-row sub-tiles,
      4096-8192-wide chunks (2 chunks per block; measured 228.9 TOPS at
      16k/hd128 vs 183.7 for the round-1 512/4096/2048 config).
    * Causal: equal Q/KV blocks (2048) for the diagonal-split path,
      full-width 2048 chunks in BOTH regions (measured 149.2 TOPS at
      16k/hd128 = 1.25x flash vs 138.4 for the round-1 config).
    * Wide heads (d > 128) halve the caps to bound compile-time unrolls.
    * ``masked`` (an explicit bool attn_mask rides in the kernel): cap the
      KV block at 4096 (2048 causal) so the [block_q, block_k] int8 mask
      block and its double buffer stay modest.

    An autotuned table (see :func:`set_tuned_configs`) overrides the
    heuristic per exact (padded) shape.
    """
    tuned_tbl = _load_tuned()
    tuned = tuned_tbl.get(
        config_key(sq, sk, d, is_causal, masked, vt, window)
    )
    if tuned is None and window:
        # no window-specific entry: fall back to the plain-shape entry
        tuned = tuned_tbl.get(config_key(sq, sk, d, is_causal, masked, vt))
    if tuned is not None:
        return tuned[:4]
    if vt and d <= 128:
        # transposed-formulation winners (measured r4, v5e, b4 h32; see
        # BASELINE.md "hd64"): much wider sub-tiles pay off because the
        # PV matmul runs at full MXU rate and the VPU passes are
        # per-item, and the causal fold grid wants narrow diagonal
        # chunks (default_diag_chunk below)
        sq_p, sk_p = _pad128(sq), _pad128(sk)

        def sub_of(bq, want):
            # the sub-tile must divide the q block; padded odd lengths
            # (e.g. bq 384) step down to the largest dividing width
            for cand in (want, 512, 256, 128):
                if cand <= want and bq % cand == 0:
                    return cand
            return 128

        # The r4 convergent result (full sweeps c-f + the hd128 vt
        # sweep): the TRANSPOSED formulation with NARROW chunks —
        # [ck, sub] = [256, 256] score tiles — dominates at every
        # d <= 128 shape and both causalities (hd64: 16k nc 189.7 =
        # 0.95x of its mixed MXU ceiling, 16k causal 160.7 vs 104.6;
        # hd128: 4k nc 249.4 vs 199 normal = 0.99x of ITS ceiling,
        # 4k causal 193.5 vs 110.8).  The same configs win at both
        # head dims; d > 128 keeps the normal orientation below.
        if is_causal:
            # small grids prefer 1024-blocks (the fold grid needs >= 2
            # rows to fill the pipeline: 93.9 vs 67.5 TOPS at 2k)
            sp = max(sq_p, sk_p)
            blk = min(1024 if sp <= 2048 else 2048, sp)
            bq = min(blk, sq_p)
            ck = 256 if blk % 256 == 0 else blk
            return bq, blk, sub_of(bq, 256), ck
        if sk_p <= 4096:
            bq = min(sq_p, 1024 if sk_p <= 2048 else 4096)
            ck = 256 if sk_p % 256 == 0 else sk_p
            return bq, sk_p, sub_of(bq, 256), ck
        bk = min(16384, sk_p)
        if sk_p % bk:
            # ragged long rows (e.g. CogVideoX's 17776): a non-dividing
            # bk would pad KV to the next bk multiple (+84% dead
            # compute); one whole-row step takes a ragged last chunk
            bk = sk_p
        bq = min(1024, sq_p)
        return bq, bk, sub_of(bq, 256), 256
    if is_causal:
        cap = 2048 if d <= 128 else 1024
        blk = min(cap, _pad128(max(sq, sk)))
        bq = min(blk, _pad128(sq))
        return bq, blk, 128, blk
    cap = 32768 if d <= 128 else 8192
    if masked:
        cap = min(cap, 4096)
    sq_p = _pad128(sq)
    # small sequences: half-size Q blocks give the grid pipeline >= 2
    # steps to overlap DMAs (measured at 512-1024; noise-level above);
    # keep the block a multiple of the 128-row sub-tile
    block_q = (
        min(sq_p, max(256, sq_p // 2 // 128 * 128))
        if sq_p <= 1024 else 1024
    )
    block_k = min(cap, _pad128(sk))
    return block_q, block_k, 128, effective_chunk_k(block_k)


def default_diag_chunk(
    sq: int, sk: int, d: int, is_causal: bool, masked: bool = False,
    vt: bool = False, window: int | None = None,
) -> int | None:
    """The causal diagonal region's chunk width for a shape, when the
    tuned table records one (the optional 5th entry element); None means
    "use chunk_k" (the built-in behavior).  Narrower diagonal chunks
    trade VPU efficiency for trace-time skipping of above-diagonal work
    items inside the diagonal block — a measured win at small causal
    grids where diagonal blocks dominate (see tools/autotune.py)."""
    tuned_tbl = _load_tuned()
    tuned = tuned_tbl.get(
        config_key(sq, sk, d, is_causal, masked, vt, window)
    )
    if tuned is None and window:
        tuned = tuned_tbl.get(config_key(sq, sk, d, is_causal, masked, vt))
    if tuned is not None and len(tuned) == 5 and tuned[4] != tuned[3]:
        return tuned[4]
    # no heuristic dck since the r4 narrow-chunk retune: the vt configs
    # run 256-wide chunks outright (default_config), which subsumes the
    # diagonal-chunk trick (dck == ck); only a tuned-table 5th element
    # can introduce a narrower diagonal now
    return None


def _compute_parts(
    *,
    q_idx,
    kv_idx,
    q_ref,
    qs_ref,
    k_ref,
    ks_ref,
    v_ref,
    qseg_ref,
    kseg_ref,
    qpos_ref,
    kpos_ref,
    cbias_ref,
    mask_ref=None,
    bias_ref=None,
    causal: bool,
    k_scale_blocked: bool,
    has_segments: bool,
    has_positions: bool,
    sub_q: int,
    chunk_k: int,
    n_chunks: int,
    n_sub: int,
    block_q: int,
    block_k: int,
    v_needs_cast: bool,
    p_int8: bool = False,
    qk_int4: bool = False,
    q_fold: float | None = None,
    window: int | None = None,
    k_from_scratch: bool = False,
    rowsum_lane: int | None = None,
    diag_static: bool = False,
    ledge_static: bool = False,
    scale_group: int | None = None,
    ml_scr=None,
    vt: bool = False,
    vt_native: bool = False,
    kv_live: int | None = None,
):
    """One KV block: the pipelined (sub-tile x chunk) split-softmax.

    ``vt`` (transposed formulation, the d<=64 MXU rescue): every tile is
    transposed — scores are S^T = K.Q^T [chunk, sub_q] and the PV matmul
    is O^T = V^T.P^T [d_v, sub_q].  At head_dim 64 the NORMAL orientation
    runs both matmuls at half MXU utilization (QK's contraction depth 64
    half-fills the 128-deep systolic array; PV's 64 output lanes waste
    half the array width even when padded).  Transposing moves sub_q
    (=128) onto the PV matmul's lane axis, so PV runs at the FULL bf16
    rate; QK keeps its 64-deep contraction either way (measured:
    tools/probe_mxu.py, "transposed formulation" section).  Q arrives as
    [d, block_q] blocks, V as [d_v, block_k], q scales as rows
    [1, block_q]; reductions go over sublanes; masks/iotas swap axes.

    Returns per-sub-tile lists of independent (m_c, l_c, pv_c) partials.

    ``diag_static``: this is THE diagonal block of a causal attention with
    block_q == block_k, so the causal structure is static relative to the
    block: work items wholly above the diagonal are skipped at trace time,
    items wholly below run unmasked, and only straddling items get the
    iota mask — the TPU analogue of the reference's two-phase causal
    kernel (reference: triton/attn_qk_int8_per_block_causal.py:28-46,
    dual _attn_fwd_inner calls :105-115).

    ``ledge_static``: this is the LEFT-EDGE block of a block-aligned
    sliding window (window %% block_k == 0, block_q == block_k): the
    window's left boundary falls exactly on the block diagonal, so the
    live region is the strict *upper* triangle — the transpose of the
    diag_static case.  Items wholly at/below the diagonal are skipped at
    trace time, items wholly above run unmasked, straddles get the iota
    mask.

    ``scale_group``: the K quantization group width.  Normally equal to
    ``chunk_k``; the causal diagonal region runs narrower chunks than the
    quant group (to halve its VMEM so both pl.when regions fit), so the
    SMEM scale index is derived from the chunk's global column."""
    if scale_group is None:
        scale_group = chunk_k
    # the softmax-reduction (kv) axis of a score tile; q rows live on the
    # other axis.  All reductions below use keepdims so the same code
    # yields [sub_q, 1] (normal) or [1, sub_q] (vt) broadcast shapes.
    red = 0 if vt else 1
    if q_fold is not None:
        # Q arrives UNQUANTIZED (bf16): quantize per row in-register —
        # bit-identical to the quant_q_per_token prologue (same amax /
        # inv-scale / round chain) but with zero extra HBM traffic; the
        # per-row VPU cost is ~d/sk of the softmax work (negligible).
        from sageattention_tpu.quant import inv_scale, round_half_away

        q_qmax = 7.0 if qk_int4 else 127.0
        subs, qs_subs = [], []
        for i in range(n_sub):
            if vt and not vt_native:
                # transposed Q block [d, block_q]: q rows are COLUMNS, so
                # the per-row amax reduces over sublanes
                qb = q_ref[0, 0, :, i * sub_q:(i + 1) * sub_q].astype(
                    jnp.float32
                )
                hd_ax = 0
            else:
                qb = q_ref[0, 0, i * sub_q:(i + 1) * sub_q, :].astype(
                    jnp.float32
                )
                hd_ax = 1
            # amax over the head-dim axis of the Q tile
            amax = jnp.max(jnp.abs(qb), axis=hd_ax, keepdims=True)
            scale, r = inv_scale(amax, q_qmax)
            # no clip: r = qmax/amax of this tile, |qb*r| <= qmax+2ulp
            qi8 = round_half_away(qb * r).astype(jnp.int8)
            subs.append(qi8)
            if vt and vt_native:
                # vt_native reads NORMAL-layout Q (the MXU's
                # dimension_numbers absorb the transpose; no XLA Q^T
                # relayout pass) — only the tiny per-row scale column
                # [sub, 1] reorients to the vt row form [1, sub]
                qs_subs.append(jnp.swapaxes(scale, 0, 1) * q_fold)
            else:
                qs_subs.append(scale * q_fold)
    elif vt:
        subs = [
            q_ref[0, 0, :, i * sub_q:(i + 1) * sub_q] for i in range(n_sub)
        ]
        qs_subs = [
            qs_ref[0, 0, :, i * sub_q:(i + 1) * sub_q] for i in range(n_sub)
        ]
    else:
        subs = [
            q_ref[0, 0, i * sub_q:(i + 1) * sub_q, :] for i in range(n_sub)
        ]
        qs_subs = [
            qs_ref[0, 0, i * sub_q:(i + 1) * sub_q, :] for i in range(n_sub)
        ]
    # chunk column bounds; the last chunk may be ragged (block_k need not
    # be a chunk multiple when the KV row fits one grid step)
    cb = [
        (c * chunk_k, min((c + 1) * chunk_k, block_k))
        for c in range(n_chunks)
    ]

    def qk(item):
        qi, c = item
        if k_from_scratch:
            k = k_ref[cb[c][0]:cb[c][1], :]   # 2D VMEM scratch
        else:
            k = k_ref[0, 0, cb[c][0]:cb[c][1], :]
        qq = subs[qi]
        if qk_int4:
            # int4 MXU runs ~2x the int8 rate on this chip (measured 725
            # vs 343 TOPS roofline); operands are quantized to +-7 by the
            # bits=4 quantizers, so the in-register s8->s4 cast is exact
            # (reference int4 MMA: csrc/mma.cuh:429-527 s4s4s32).
            qq = qq.astype(jnp.int4)
            k = k.astype(jnp.int4)
        if vt:
            # S^T = K . Q^T: K [chunk, d] streams through the MXU while
            # the small Q^T is the stationary operand.  vt_native keeps Q
            # in its NORMAL [sub_q, d] tile and contracts d-vs-d — the
            # operand transpose happens inside the MXU feed, not as an
            # XLA relayout pass.
            qdims = (((1,), (1,)) if vt_native else ((1,), (0,)))
            return jax.lax.dot_general(
                k,
                qq,
                dimension_numbers=(qdims, ((), ())),
                preferred_element_type=jnp.int32,
            )  # [chunk_k, sub_q] int32
        return jax.lax.dot_general(
            qq,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [sub_q, chunk_k] int32

    def soft_pv(item, s_i32):
        """Independent chunk softmax: returns (m_c, l_c, pv_c, dead_mask)."""
        qi, c = item
        qs = qs_subs[qi]  # [sub_q, 1] f32 ([1, sub_q] in vt), folded

        # score-tile axes: q rows on axis 0 and kv columns on axis 1
        # normally; swapped under vt
        kv_ax, q_ax = (0, 1) if vt else (1, 0)
        mask = None
        if mask_ref is not None:
            # explicit bool mask block (int8 storage; the reference's
            # in-kernel attn_mask, attn_qk_int8_per_block.py:35-37)
            mask = (
                mask_ref[0, 0, qi * sub_q:(qi + 1) * sub_q,
                         cb[c][0]:cb[c][1]] != 0
            )
        if has_segments:
            if vt:
                # transposed score tile [chunk, sub]: segments arrive as
                # per-q-row LIVE KV RANGES (lo/hi lane vectors, valid for
                # contiguous segment layouts — pad masking and varlen
                # packing) and the kv side is a free sublane iota.  A
                # [sk, 1] kv-id column would lane-pad 128x (9 MB VMEM at
                # 17k); the range form costs two compares like causal.
                lo = qseg_ref[0, :, qi * sub_q:(qi + 1) * sub_q]  # [1,sub]
                hi = kseg_ref[0, :, qi * sub_q:(qi + 1) * sub_q]  # [1,sub]
                kvi = jax.lax.broadcasted_iota(
                    jnp.int32, s_i32.shape, kv_ax
                ) + kv_idx * block_k + cb[c][0]
                sm = jnp.logical_and(kvi >= lo, kvi < hi)
            else:
                qseg = qseg_ref[0, qi * sub_q:(qi + 1) * sub_q, :]
                kseg = kseg_ref[0, :, cb[c][0]:cb[c][1]]
                sm = qseg == kseg
            mask = sm if mask is None else jnp.logical_and(mask, sm)
        if has_positions:
            qpos = qpos_ref[0, qi * sub_q:(qi + 1) * sub_q, :]
            kpos = kpos_ref[0, :, cb[c][0]:cb[c][1]]
            pmask = kpos <= qpos
            mask = pmask if mask is None else jnp.logical_and(mask, pmask)
        if kv_live is not None and cb[c][1] > kv_live:
            # STATIC ragged-KV pad mask (single-KV-block grids): only the
            # chunk straddling ``kv_live`` pays any mask work — every
            # earlier chunk is statically all-live, and q-pad rows need
            # no masking at all (they attend live keys; garbage rows are
            # cropped by the caller).  Replaces the per-q-row range
            # arrays, whose per-item masks blew scoped VMEM to 125 MB on
            # 17k-seq whole-row steps.
            kvi = jax.lax.broadcasted_iota(
                jnp.int32, s_i32.shape, kv_ax
            ) + cb[c][0]
            lm = kvi < kv_live
            mask = lm if mask is None else jnp.logical_and(mask, lm)
        if diag_static:
            # static relative offsets: the block's global row/col offsets
            # cancel (kv_idx * block_k == q_idx * block_q on the diagonal)
            if (c + 1) * chunk_k - 1 > qi * sub_q:  # straddles the diagonal
                kvi = jax.lax.broadcasted_iota(
                    jnp.int32, s_i32.shape, kv_ax
                )
                qqi = jax.lax.broadcasted_iota(jnp.int32, s_i32.shape, q_ax)
                cm = (kvi + c * chunk_k) <= (qqi + qi * sub_q)
                mask = cm if mask is None else jnp.logical_and(mask, cm)
        elif ledge_static:
            # block-aligned window left edge: offsets cancel the same way
            # (kv_idx * block_k == q_idx * block_q - window), leaving the
            # strict upper triangle live
            if c * chunk_k <= qi * sub_q + sub_q - 1:  # straddles
                kvi = jax.lax.broadcasted_iota(
                    jnp.int32, s_i32.shape, kv_ax
                )
                qqi = jax.lax.broadcasted_iota(jnp.int32, s_i32.shape, q_ax)
                cm = (kvi + c * chunk_k) > (qqi + qi * sub_q)
                mask = cm if mask is None else jnp.logical_and(mask, cm)
        elif causal:
            kvi = jax.lax.broadcasted_iota(jnp.int32, s_i32.shape, kv_ax)
            qqi = jax.lax.broadcasted_iota(jnp.int32, s_i32.shape, q_ax)
            gkv = kvi + kv_idx * block_k + c * chunk_k
            gq = qqi + q_idx * block_q + qi * sub_q
            cm = gkv <= gq
            if window is not None:
                # sliding window: key j visible iff q - W < j <= q
                cm = jnp.logical_and(cm, gkv > gq - window)
            mask = cm if mask is None else jnp.logical_and(mask, cm)

        # Lazy softmax only on UNMASKED work items: computing m_ref from
        # an unmasked first chunk risks silently zeroing live rows when
        # masked columns carry spuriously large logits, and computing it
        # from a masked chunk risks exp2 overflow when the chunk is fully
        # dead — masked items take the exact per-chunk max instead (they
        # are the small minority: diagonal straddles, window edges,
        # segment boundaries).  The merge handles mixed lazy/exact
        # partials exactly.  An additive bias shifts maxima arbitrarily,
        # so biased items always take the exact per-chunk max too.
        lazy = not p_int8 and mask is None and bias_ref is None
        if k_scale_blocked and cbias_ref is None:
            # FAST PATH: one K scale per chunk from SMEM; dequantization
            # is one fused multiply feeding exp2.
            ksc = ks_ref[
                0, 0, 0, (kv_idx * block_k + cb[c][0]) // scale_group
            ]
            rowscale = qs * ksc  # [sub_q, 1]
            sf = None
        elif k_scale_blocked:
            # smooth_q correction: a per-column bias (qm . k_smoothed,
            # base-2 domain) joins after dequant in f32 (the column-
            # varying bias breaks the int-domain max commute)
            ksc = ks_ref[
                0, 0, 0, (kv_idx * block_k + cb[c][0]) // scale_group
            ]
            rowscale = qs * ksc
            sf = (
                s_i32.astype(jnp.float32) * rowscale
                + cbias_ref[0, 0, :, cb[c][0]:cb[c][1]]
            )
        else:
            # Per-row K scales (reference-parity accuracy mode): one extra
            # broadcast multiply per element.
            ks = ks_ref[0, 0, :, cb[c][0]:cb[c][1]]  # [1, chunk]
            sf = s_i32.astype(jnp.float32) * qs * ks
            if cbias_ref is not None:
                sf = sf + cbias_ref[0, 0, :, cb[c][0]:cb[c][1]]
        if bias_ref is not None:
            # In-kernel ADDITIVE attention bias (torch-sdpa float-mask
            # semantics: softmax(q.k^T*sm_scale + bias); the reference
            # applies it fused the same way on its triton path,
            # attn_qk_int8_per_thread.py:49-56).  The bias joins the
            # dequantized base-2 logits (x log2e); -inf entries clamp to
            # the finite MASK_VALUE sentinel so the max/exp2 chain stays
            # NaN-free, and rows whose max IS the sentinel are fully dead
            # (all -inf) — flagged via ``dead`` below like a bool mask.
            bias_tile = bias_ref[
                0, 0, qi * sub_q:(qi + 1) * sub_q, cb[c][0]:cb[c][1]
            ].astype(jnp.float32) * LOG2E
            if sf is None:
                sf = s_i32.astype(jnp.float32) * rowscale + bias_tile
            else:
                sf = sf + bias_tile
            sf = jnp.maximum(sf, MASK_VALUE)

        if lazy:
            # LAZY SOFTMAX REFERENCE: the per-chunk row-max pass — one of
            # the four VPU passes over every [sub, chunk] score tile — is
            # replaced by a per-sub-tile reference m_ref computed ONCE
            # from the sub-tile's first unmasked chunk (raw row max joined
            # with the running block max in ml_scr).  exp2 against a
            # trailing reference is safe: p may exceed 1, but f32/bf16
            # carry exponents to 2^127, so correctness holds for any
            # within-block logit spread < ~120 base-2 units (a softmax
            # with spread > 30 is already one-hot; the fp32 oracle itself
            # degrades long before 120) — certified at the boundary by
            # tests/test_lazy_softmax.py.  The merge is unchanged: every
            # lazy partial of the sub-tile reports m_ref as its max, so
            # _merge_into_scratch's max-of-maxes collapses to m_ref and
            # the per-chunk rescale weights become exp2(0).
            m_ref = m_ref_map.get(qi)
            if m_ref is None:
                if sf is None:
                    raw = jnp.max(s_i32, axis=red, keepdims=True)
                    m_c0 = raw.astype(jnp.float32) * rowscale
                else:
                    m_c0 = jnp.max(sf, axis=red, keepdims=True)
                if ml_scr is not None:
                    # multi-step grid: join the running block max so the
                    # reference never regresses across KV blocks
                    if vt:
                        m_prev = ml_scr[0:1, qi * sub_q:(qi + 1) * sub_q]
                    else:
                        m_prev = ml_scr[qi * sub_q:(qi + 1) * sub_q, 0:1]
                    m_c0 = jnp.maximum(m_prev, m_c0)
                m_ref = m_c0
                m_ref_map[qi] = m_ref
            if sf is None:
                p = jnp.exp2(
                    s_i32.astype(jnp.float32) * rowscale - m_ref
                )
            else:
                p = jnp.exp2(sf - m_ref)
            m_c = m_ref
        else:
            # exact per-chunk max (p_int8 requires p <= 1 for its fixed
            # 127 scale; also any item carrying a mask, and the
            # interpret-mode reference semantics)
            dead = None
            if sf is None:
                if mask is not None:
                    s_i32 = jnp.where(mask, s_i32, MASK_I32)
                imax = jnp.max(s_i32, axis=red, keepdims=True)
                if mask is not None:
                    # live rows cannot reach the sentinel
                    dead = imax == MASK_I32
                m_c = imax.astype(jnp.float32) * rowscale
                p = jnp.exp2(s_i32.astype(jnp.float32) * rowscale - m_c)
            else:
                if mask is not None:
                    sf = jnp.where(mask, sf, MASK_VALUE)
                m_c = jnp.max(sf, axis=red, keepdims=True)
                if mask is not None or bias_ref is not None:
                    # all-masked OR all-(-inf)-bias rows sit exactly at
                    # the sentinel
                    dead = m_c == MASK_VALUE
                p = jnp.exp2(sf - m_c)
            if mask is not None:
                # A fully-masked chunk yields p == 1 everywhere
                # (s - m == 0); zero it and flag the rows dead via m_c.
                p = jnp.where(mask, p, 0.0)
            if dead is not None:
                # dead rows (incl. live-mask rows whose bias is all -inf)
                # would otherwise carry p == 1 uniformly
                p = jnp.where(dead, 0.0, p)
                m_c = jnp.where(dead, NEG_INIT, m_c)

        if vt and not vt_native:
            v = v_ref[0, 0, :, cb[c][0]:cb[c][1]]  # [d_v, chunk] (V^T)
        else:
            v = v_ref[0, 0, cb[c][0]:cb[c][1], :]
        if p_int8:
            # Quantized-P PV: the int8 MXU runs ~1.9x bf16 on this chip
            # (measured roofline 343 vs 178 TOPS), so P is requantized
            # to int8 with the FIXED scale 127 (each chunk's max is
            # exp2(0) = 1 after the m_c subtraction — no amax pass
            # needed).  The analogue of the reference's FP8-P MMA
            # (attn_utils.cuh:777-992 compute_fp8_sv); the 1/127 dequant
            # folds into one multiply on the small [sub, d] output tile.
            # p >= 0, so +0.5-and-truncate IS round-to-nearest.
            p_q = (p * 127.0 + 0.5).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_q,
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (1.0 / 127.0)  # [sub_q, d_v]
        elif vt:
            # O^T = V^T . P^T: stationary operand P^T [chunk, sub_q] has
            # a FULL 128-deep contraction and FULL 128 lanes — the d=64
            # MXU rescue (the normal orientation wastes half the array
            # on d_v = 64 output lanes).  vt_native streams V in its
            # NORMAL [chunk, d_v] tile and contracts chunk-vs-chunk (the
            # transpose rides the MXU feed; no XLA V^T relayout pass).
            if v_needs_cast:
                v = v.astype(jnp.bfloat16)
            vdims = (((0,), (0,)) if vt_native else ((1,), (0,)))
            pv = jax.lax.dot_general(
                v,
                p.astype(jnp.bfloat16),
                dimension_numbers=(vdims, ((), ())),
                preferred_element_type=jnp.float32,
            )  # [d_v, sub_q] f32
        else:
            if v_needs_cast:
                v = v.astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [sub_q, d_v] f32
        if rowsum_lane is not None:
            # d <= 64 pads V to 128 lanes anyway: a ones column planted at
            # ``rowsum_lane`` makes the MXU produce sum(p) for free,
            # removing the VPU cross-lane sum (the reference's
            # rowsum-via-MMA idea, reference: csrc/mma.cuh:683-721
            # rowsum_f16f16f32/rowsum_f8f8f32).  With quantized P the
            # lane carries sum(p_q)/127 — the normalization consistent
            # with the quantized numerator.
            l_c = pv[:, rowsum_lane:rowsum_lane + 1]
        else:
            l_c = jnp.sum(p, axis=red, keepdims=True)
        return m_c, l_c, pv

    # Software pipeline over work items (chunk-major round robin): the QK
    # MXU op for item t+1 is issued before item t's VPU softmax, and items
    # are independent chains, so Mosaic can overlap MXU and VPU.
    m_ref_map: dict[int, jax.Array] = {}
    work = [(qi, c) for c in range(n_chunks) for qi in range(n_sub)]
    if diag_static:
        # skip items wholly above the diagonal at trace time
        work = [
            (qi, c) for qi, c in work
            if c * chunk_k <= qi * sub_q + sub_q - 1
        ]
    if ledge_static:
        # skip items wholly at/below the diagonal (outside the window)
        work = [
            (qi, c) for qi, c in work
            if (c + 1) * chunk_k - 1 > qi * sub_q
        ]
    parts: dict[int, list] = {qi: [] for qi in range(n_sub)}
    s_prev = qk(work[0])
    for t in range(1, len(work)):
        s_next = qk(work[t])
        item = work[t - 1]
        parts[item[0]].append(soft_pv(item, s_prev))
        s_prev = s_next
    parts[work[-1][0]].append(soft_pv(work[-1], s_prev))
    return parts


def _merge_parts(ps, m_to=None):
    """Exact LSE-weighted merge of independent (m_c, l_c, pv_c) partials.

    Returns (m, l, acc) values; if ``m_to`` is given the partials are merged
    at that max instead of their own (for merging into a running state)."""
    if m_to is None:
        m = ps[0][0]
        for m_c, _, _ in ps[1:]:
            m = jnp.maximum(m, m_c)
    else:
        m = m_to
    l = jnp.zeros_like(ps[0][1])
    acc = jnp.zeros_like(ps[0][2])
    for m_c, l_c, pv_c in ps:
        w = jnp.exp2(m_c - m)
        l = l + w * l_c
        # w is [sub_q, 1] (normal) or [1, sub_q] (vt); either broadcasts
        # against its pv_c orientation directly
        acc = acc + pv_c * w
    return m, l, acc


def _merge_into_scratch(parts, n_sub, sub_q, ml_scr, acc_scr, vt=False):
    """Merge per-sub-tile partials into the running cross-KV-block state.

    ``ml_scr`` packs the running row max (lane 0) and row sum (lane 1)
    into ONE (block_q, 128) scratch — separate buffers would each pad to
    128 lanes and waste a megabyte at block_q = 2048.  Under ``vt`` the
    scratch transposes to (8, block_q): the max in sublane ROW 0, the sum
    in row 1, and ``acc_scr`` is the transposed (d_v, block_q) running O^T."""
    for qi in range(n_sub):
        rows = slice(qi * sub_q, (qi + 1) * sub_q)
        m_blk = parts[qi][0][0]
        for m_c, _, _ in parts[qi][1:]:
            m_blk = jnp.maximum(m_blk, m_c)
        if vt:
            m_prev = ml_scr[0:1, rows]
            m_next = jnp.maximum(m_prev, m_blk)
            _, l_blk, acc_blk = _merge_parts(parts[qi], m_to=m_next)
            alpha = jnp.exp2(m_prev - m_next)
            ml_scr[0:1, rows] = m_next
            ml_scr[1:2, rows] = alpha * ml_scr[1:2, rows] + l_blk
            acc_scr[:, rows] = acc_scr[:, rows] * alpha + acc_blk
        else:
            m_prev = ml_scr[rows, 0:1]
            m_next = jnp.maximum(m_prev, m_blk)
            _, l_blk, acc_blk = _merge_parts(parts[qi], m_to=m_next)
            alpha = jnp.exp2(m_prev - m_next)
            ml_scr[rows, 0:1] = m_next
            ml_scr[rows, 1:2] = alpha * ml_scr[rows, 1:2] + l_blk
            acc_scr[rows, :] = acc_scr[rows, :] * alpha[:, :1] + acc_blk


def _kernel(
    q_ref,
    qs_ref,
    k_ref,
    ks_ref,
    v_ref,
    vs_ref,
    vm_ref,
    qseg_ref,
    kseg_ref,
    qpos_ref,
    kpos_ref,
    cbias_ref,
    mask_ref,
    bias_ref,
    msum_ref,
    o_ref,
    lse_ref,
    ml_scr,
    acc_scr,
    *,
    causal: bool,
    k_scale_blocked: bool,
    has_v_scale: bool,
    has_v_mean: bool,
    has_segments: bool,
    has_positions: bool,
    return_lse: bool,
    sub_q: int,
    chunk_k: int,
    diag_chunk_k: int,
    block_q: int,
    block_k: int,
    n_kv: int,
    v_needs_cast: bool,
    p_int8: bool,
    qk_int4: bool,
    q_fold: float | None,
    window: int | None,
    rowsum_lane: int | None,
    out_dtype,
    kv_shift: int | None = None,
    fold: int | None = None,
    vt: bool = False,
    vt_native: bool = False,
    vt_o_normal: bool = False,
):
    q_idx = pl.program_id(2)
    g_idx = pl.program_id(3)
    if fold is not None:
        # fold grid (see launcher): (fold row f, step j) packs q rows f
        # and fold - f back to back; every step is a live causal block
        first = g_idx <= q_idx
        kv_idx = jnp.where(first, g_idx, g_idx - q_idx - 1)
        q_idx = jnp.where(first, q_idx, fold - q_idx)
        init = kv_idx == 0
    elif kv_shift is None:
        kv_idx = g_idx
        init = g_idx == 0
    else:
        # band grid (see launcher): grid step g maps to the physical KV
        # block max(q - m, 0) + g; early q rows run some above-diagonal
        # steps, which no region fires for
        kv_idx = g_idx + jnp.maximum(q_idx - kv_shift, 0)
        init = g_idx == 0
    n_chunks = -(-block_k // chunk_k)
    n_sub = block_q // sub_q

    @pl.when(init)
    def _init():
        ml_scr[...] = jnp.zeros_like(ml_scr)
        if vt:
            ml_scr[0:1, :] = jnp.full_like(ml_scr[0:1, :], NEG_INIT)
        else:
            ml_scr[:, 0:1] = jnp.full_like(ml_scr[:, 0:1], NEG_INIT)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # per-(q block, kv block) liveness from the mask summary: fully-masked
    # KV blocks skip ALL compute (the reference's in-kernel block skip,
    # attn_qk_int8_per_block.py:35-37); their DMAs still run (index maps
    # cannot branch on data).
    if msum_ref is None:
        def _and_live(cond):
            return cond
    else:
        _live = msum_ref[0, 0, 0, q_idx * n_kv + kv_idx] != 0

        def _and_live(cond):
            return jnp.logical_and(cond, _live)

    common = dict(
        q_ref=q_ref,
        qs_ref=qs_ref,
        k_ref=k_ref,
        ks_ref=ks_ref,
        v_ref=v_ref,
        qseg_ref=qseg_ref,
        kseg_ref=kseg_ref,
        qpos_ref=qpos_ref,
        kpos_ref=kpos_ref,
        cbias_ref=cbias_ref,
        mask_ref=mask_ref,
        bias_ref=bias_ref,
        k_scale_blocked=k_scale_blocked,
        has_segments=has_segments,
        has_positions=has_positions,
        sub_q=sub_q,
        chunk_k=chunk_k,
        n_chunks=n_chunks,
        n_sub=n_sub,
        block_q=block_q,
        block_k=block_k,
        v_needs_cast=v_needs_cast,
        p_int8=p_int8,
        qk_int4=qk_int4,
        q_fold=q_fold,
        window=window,
        rowsum_lane=rowsum_lane,
        ml_scr=ml_scr,
        vt=vt,
        vt_native=vt_native,
    )

    if causal and block_q == block_k:
        # Diagonal-split causal: blocks strictly below the diagonal
        # (kv_idx < q_idx) run completely unmasked; the diagonal block
        # (kv_idx == q_idx) uses trace-time item skipping and static
        # straddle masks; blocks above never run (and their DMAs are
        # clamped away in the index maps).  This removes every causal
        # VPU masking pass from the sub-diagonal bulk of the work —
        # the reference's two-phase causal structure
        # (reference: triton/attn_qk_int8_per_block_causal.py:105-115).
        aligned = window is not None and window % block_k == 0
        if window is None:
            interior = kv_idx < q_idx
        elif aligned:
            # Block-aligned window (window == m * block_k): the band's
            # left boundary falls exactly on a block diagonal, so every
            # block is one of interior (kv in (q-m, q), unmasked), the
            # causal diagonal (kv == q, static mask), or the left edge
            # (kv == q - m, static transpose mask) — no dynamic masks
            # anywhere.
            m_blocks = window // block_k
            interior = jnp.logical_and(
                kv_idx < q_idx, kv_idx + m_blocks > q_idx
            )
        else:
            # Unaligned window: a block is mask-free only when every row
            # of the q block sees every column — strictly below the
            # diagonal AND past the window's left edge for the block's
            # LAST row.  The diagonal and both straddles share one
            # dynamic-mask region (the same band formula covers top and
            # bottom edges).
            live = jnp.logical_and(
                kv_idx <= q_idx,
                kv_idx * block_k + block_k - 1 > q_idx * block_q - window,
            )
            interior = jnp.logical_and(
                kv_idx < q_idx,
                kv_idx * block_k >= q_idx * block_q + block_q - window,
            )
            edge = jnp.logical_and(live, jnp.logical_not(interior))

        @pl.when(_and_live(interior))
        def _below():
            parts = _compute_parts(
                q_idx=q_idx, kv_idx=kv_idx, causal=False, **common
            )
            _merge_into_scratch(parts, n_sub, sub_q, ml_scr, acc_scr, vt)

        # Edge regions run half-width chunks: Mosaic allocates the
        # pl.when regions' buffers additively, so the edge tiles must be
        # smaller for all regions to fit VMEM at the full interior chunk
        # width.  The K-scale group stays the quantizer's (scale_group),
        # indexed by global column.
        half = dict(common)
        half["scale_group"] = chunk_k
        half["chunk_k"] = diag_chunk_k
        half["n_chunks"] = -(-block_k // diag_chunk_k)

        if window is not None and not aligned:
            @pl.when(_and_live(edge))
            def _edge():
                # half-width tiles like the diag/ledge regions (pl.when
                # buffers allocate additively); identical to **common
                # when diag_chunk_k == chunk_k (the tuned default)
                parts = _compute_parts(
                    q_idx=q_idx, kv_idx=kv_idx, causal=True, **half
                )
                _merge_into_scratch(
                    parts, n_sub, sub_q, ml_scr, acc_scr, vt
                )

        if window is None or aligned:
            @pl.when(_and_live(kv_idx == q_idx))
            def _diag():
                parts = _compute_parts(
                    q_idx=q_idx, kv_idx=kv_idx, causal=False,
                    diag_static=True, **half
                )
                _merge_into_scratch(parts, n_sub, sub_q, ml_scr, acc_scr, vt)

        if aligned:
            @pl.when(_and_live(kv_idx + m_blocks == q_idx))
            def _ledge():
                parts = _compute_parts(
                    q_idx=q_idx, kv_idx=kv_idx, causal=False,
                    ledge_static=True, **half
                )
                _merge_into_scratch(parts, n_sub, sub_q, ml_scr, acc_scr, vt)

    else:
        if causal:
            # generic causal (unequal blocks / sliding window): dynamic
            # masks everywhere (reference early-exit: sm89.cuh:225-229).
            should_run = kv_idx * block_k <= q_idx * block_q + (block_q - 1)
            if window is not None:
                # left edge: the block must reach past q_start - W
                should_run = jnp.logical_and(
                    should_run,
                    kv_idx * block_k + block_k - 1
                    > q_idx * block_q - window,
                )
        else:
            should_run = True

        @pl.when(_and_live(should_run))
        def _body():
            parts = _compute_parts(
                q_idx=q_idx, kv_idx=kv_idx, causal=causal, **common
            )
            _merge_into_scratch(parts, n_sub, sub_q, ml_scr, acc_scr, vt)

    if causal:
        last_kv = jnp.minimum(
            n_kv - 1, (q_idx * block_q + block_q - 1) // block_k
        )
    else:
        last_kv = n_kv - 1

    @pl.when(kv_idx == last_kv)
    def _epilogue():
        if vt:
            # transposed state: l/m are sublane rows of ml_scr, the
            # output block is O^T [d_out, block_q], per-channel v scale /
            # mean broadcast as COLUMNS
            l = ml_scr[1:2, :]
            l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            d_out = o_ref.shape[-1] if vt_o_normal else o_ref.shape[-2]
            o = acc_scr[:d_out, :] * l_inv
            if has_v_scale:
                o = o * vs_ref[0, 0, :d_out, :]  # [d, 1] per-channel
            if has_v_mean:
                o = o + jnp.where(l == 0.0, 0.0, 1.0) * vm_ref[
                    0, 0, :d_out, :
                ]
            if vt_o_normal:
                # VMEM-local transpose once per Q block replaces the
                # XLA O^T relayout pass
                o_ref[0, 0] = jnp.swapaxes(o, 0, 1).astype(out_dtype)
            else:
                o_ref[0, 0] = o.astype(out_dtype)
            if return_lse:
                lse_ref[0, 0] = (
                    jnp.where(l == 0.0, -jnp.inf,
                              jnp.log2(jnp.maximum(l, 1e-45)))
                    + ml_scr[0:1, :]
                )
            return
        l = ml_scr[:, 1:2]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        d_out = o_ref.shape[-1]
        o = acc_scr[:, :d_out] * l_inv
        if has_v_scale:
            o = o * vs_ref[0, 0, :, :d_out]  # [1, d] per-channel
        if has_v_mean:
            # sum(p)/l == 1 for any live row, so adding the mean back is
            # exact (smooth_v epilogue, reference: sm89.cuh:602-624); dead
            # (fully-masked) rows keep 0.
            o = o + jnp.where(l == 0.0, 0.0, 1.0) * vm_ref[0, 0, :, :d_out]
        o_ref[0, 0] = o.astype(out_dtype)
        if return_lse:
            lse_ref[0, 0] = (
                jnp.where(l == 0.0, -jnp.inf,
                          jnp.log2(jnp.maximum(l, 1e-45)))
                + ml_scr[:, 0:1]
            )


def _kernel_single(
    q_ref,
    qs_ref,
    k_ref,
    ks_ref,
    v_ref,
    vs_ref,
    vm_ref,
    qseg_ref,
    kseg_ref,
    qpos_ref,
    kpos_ref,
    cbias_ref,
    mask_ref,
    bias_ref,
    msum_ref,
    km_ref,
    o_ref,
    lse_ref,
    kq_scr=None,
    kss_scr=None,
    *,
    k_inkernel: bool = False,
    causal: bool,
    k_scale_blocked: bool,
    has_v_scale: bool,
    has_v_mean: bool,
    has_segments: bool,
    has_positions: bool,
    return_lse: bool,
    sub_q: int,
    chunk_k: int,
    block_q: int,
    block_k: int,
    v_needs_cast: bool,
    p_int8: bool,
    qk_int4: bool,
    q_fold: float | None,
    window: int | None,
    rowsum_lane: int | None,
    out_dtype,
    vt: bool = False,
    vt_native: bool = False,
    vt_o_normal: bool = False,
    kv_live: int | None = None,
):
    """Single-KV-step specialization (the whole KV row fits one grid step):
    no scratch round-trips, no pl.when regions — the fastest configuration
    for the common inference shapes (DiT sequences up to ~8k)."""
    q_idx = pl.program_id(2)
    n_chunks = -(-block_k // chunk_k)
    n_sub = block_q // sub_q
    masked = (
        has_segments or has_positions or causal or mask_ref is not None
        or bias_ref is not None  # -inf bias rows can be fully dead
    )

    if k_inkernel:
        # Quantize K ONCE per (b, kv head) into scratch: the K block's
        # DMA already happens once (its index map is constant across q
        # blocks), so quantizing at q_idx == 0 moves the whole K-quant
        # prologue into the kernel with zero extra HBM traffic (the same
        # trick as the in-kernel Q quant, amortized via scratch).  The
        # chain is bit-identical to quant_k_chunked's.  MEASURED
        # op-total-NEUTRAL at 4k-8k (the quant sits on the q_idx==0
        # critical path instead of overlapping) and VMEM-heavy at 16k,
        # so core.py keeps the K prologue; the mode stays available and
        # tested.
        from sageattention_tpu.quant import inv_scale, round_half_away

        # qk_int4 narrows K to +-7 like the bits=4 prologue quantizers —
        # the in-register s8->s4 cast in qk() is only exact in that range
        k_qmax = 7.0 if qk_int4 else 127.0

        @pl.when(q_idx == 0)
        def _quant_k():
            x = k_ref[0, 0].astype(jnp.float32)  # [block_k, d]
            if km_ref is not None:
                x = x - km_ref[0, 0]
            for c in range(n_chunks):
                rows = slice(c * chunk_k, min((c + 1) * chunk_k, block_k))
                xc = x[rows, :]
                amax = jnp.max(jnp.abs(xc))
                scale, r = inv_scale(amax, k_qmax)
                # no clip: r = qmax/amax of this chunk (see quant_pallas)
                kq_scr[rows, :] = round_half_away(xc * r).astype(jnp.int8)
                kss_scr[0, 0, 0, c] = scale

        k_ref_eff, ks_ref_eff = kq_scr, kss_scr
    else:
        k_ref_eff, ks_ref_eff = k_ref, ks_ref

    parts = _compute_parts(
        q_idx=q_idx,
        kv_idx=0,
        q_ref=q_ref,
        qs_ref=qs_ref,
        k_ref=k_ref_eff,
        ks_ref=ks_ref_eff,
        k_from_scratch=k_inkernel,
        v_ref=v_ref,
        qseg_ref=qseg_ref,
        kseg_ref=kseg_ref,
        qpos_ref=qpos_ref,
        kpos_ref=kpos_ref,
        cbias_ref=cbias_ref,
        mask_ref=mask_ref,
        bias_ref=bias_ref,
        causal=causal,
        k_scale_blocked=k_scale_blocked,
        has_segments=has_segments,
        has_positions=has_positions,
        sub_q=sub_q,
        chunk_k=chunk_k,
        n_chunks=n_chunks,
        n_sub=n_sub,
        block_q=block_q,
        block_k=block_k,
        v_needs_cast=v_needs_cast,
        p_int8=p_int8,
        qk_int4=qk_int4,
        q_fold=q_fold,
        window=window,
        rowsum_lane=rowsum_lane,
        vt=vt,
        vt_native=vt_native,
        kv_live=kv_live,
    )
    if vt:
        d_out = o_ref.shape[-1] if vt_o_normal else o_ref.shape[-2]
        for qi in range(n_sub):
            rows = slice(qi * sub_q, (qi + 1) * sub_q)
            m, l, acc = _merge_parts(parts[qi])
            if masked:
                l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            else:
                l_inv = 1.0 / l
            o = acc[:d_out, :] * l_inv
            if has_v_scale:
                o = o * vs_ref[0, 0, :d_out, :]
            if has_v_mean:
                o = o + jnp.where(l == 0.0, 0.0, 1.0) * vm_ref[
                    0, 0, :d_out, :
                ]
            if vt_o_normal:
                # per-sub VMEM-local transpose; replaces the XLA O^T pass
                o_ref[0, 0, rows, :] = jnp.swapaxes(o, 0, 1).astype(
                    out_dtype
                )
            else:
                o_ref[0, 0, :, rows] = o.astype(out_dtype)
            if return_lse:
                lse_ref[0, 0, :, rows] = (
                    jnp.where(l == 0.0, -jnp.inf,
                              jnp.log2(jnp.maximum(l, 1e-45)))
                    + m
                )
        return
    d_out = o_ref.shape[-1]
    for qi in range(n_sub):
        rows = slice(qi * sub_q, (qi + 1) * sub_q)
        m, l, acc = _merge_parts(parts[qi])
        if masked:
            l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        else:
            l_inv = 1.0 / l
        o = acc[:, :d_out] * l_inv
        if has_v_scale:
            o = o * vs_ref[0, 0, :, :d_out]
        if has_v_mean:
            o = o + jnp.where(l == 0.0, 0.0, 1.0) * vm_ref[0, 0, :, :d_out]
        o_ref[0, 0, rows, :] = o.astype(out_dtype)
        if return_lse:
            lse_ref[0, 0, rows, :] = (
                jnp.where(l == 0.0, -jnp.inf,
                          jnp.log2(jnp.maximum(l, 1e-45)))
                + m
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "vt",
        "vt_native",
        "vt_o_normal",
        "is_causal",
        "pv_dtype",
        "pv_compute",
        "qk_int4",
        "q_fold",
        "window",
        "k_inkernel",
        "return_lse",
        "block_q",
        "block_k",
        "sub_q",
        "chunk_k",
        "diag_chunk_k",
        "rowsum_lane",
        "kv_live",
        "out_dtype",
        "interpret",
    ),
)
def sage_attention_fused(
    q_i8: jax.Array,
    q_scale: jax.Array,
    k_i8: jax.Array,
    k_scale: jax.Array,
    v_q: jax.Array,
    v_scale: jax.Array | None = None,
    v_mean: jax.Array | None = None,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    q_positions: jax.Array | None = None,
    kv_positions: jax.Array | None = None,
    score_col_bias: jax.Array | None = None,
    attn_mask_i8: jax.Array | None = None,
    k_mean: jax.Array | None = None,
    *,
    attn_bias: jax.Array | None = None,
    vt: bool = False,
    vt_native: bool = False,
    vt_o_normal: bool = False,
    k_inkernel: bool = False,
    is_causal: bool = False,
    pv_dtype: str = "int8",
    pv_compute: str = "bf16",
    qk_int4: bool = False,
    q_fold: float | None = None,
    window: int | None = None,
    return_lse: bool = False,
    block_q: int = 512,
    block_k: int = 4096,
    sub_q: int = 128,
    chunk_k: int = 2048,
    diag_chunk_k: int | None = None,
    rowsum_lane: int | None = None,
    kv_live: int | None = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Launch the fused kernel.  ``kv_live`` (static): columns >= it are
    ragged-KV pads — masked by a STATIC straddling-chunk-only compare
    (single-KV-step grids only; cheaper than segment ids by O(n_items)
    mask passes).

    Shapes (HND): q_i8 [b,hq,sq,d] int8; q_scale [b,hq,sq] f32 (sm_scale*
    log2e folded); k_i8 [b,hkv,sk,d] int8; k_scale either per-row
    [b,hkv,sk] f32 or per-chunk [b,hkv,sk/chunk_k] f32 (fast path);
    v_q [b,hkv,sk,d] (int8 / fp8 / bf16 storage; ``pv_dtype`` names it);
    v_scale/v_mean [b,hkv,d] f32 or None; segment ids [b,sq]/[b,sk] int32
    or None.  sq, sk must be multiples of block_q / block_k (pad upstream;
    core.py handles padding + cropping like the reference launchers,
    reference: core.py:772-786,822-828).

    ``rowsum_lane``: V may carry extra lanes beyond Q/K's head_dim with a
    ones column at this index, making sum(p) ride the PV matmul for free
    (core.py plants it when head_dim <= 64 pads V to 128 lanes anyway).

    ``attn_mask_i8``: explicit bool mask as int8 [b, hm, sq, sk] with
    hm in {1, hq} (1 = attend, 0 = drop), consumed inside the kernel —
    no score materialization (the reference's in-kernel attn_mask,
    attn_qk_int8_per_block.py:35-37, broadcast handling core.py:306-316).
    Multi-KV-step grids also get a per-(q block, kv block) liveness
    summary in SMEM so fully-masked KV blocks skip all compute.

    ``attn_bias``: ADDITIVE float bias [b, hb, sq, sk] (torch-sdpa
    float-mask semantics: softmax(q.k^T*sm_scale + bias)), applied to the
    dequantized logits inside the fused loop — the reference's triton
    non-bool mask add (attn_qk_int8_per_thread.py:49-56).  -inf entries
    act as masks; fully -inf rows produce 0 output / -inf LSE.  Biased
    work items take the exact per-chunk max (lazy softmax off).

    ``vt`` (transposed formulation — the d<=64 MXU rescue, see
    :func:`_compute_parts`): q_i8 arrives TRANSPOSED [b,hq,d,sq] (int8,
    or bf16 with ``q_fold``), v_q arrives transposed [b,hkv,d_v,sk];
    k_i8/k_scale/q_scale keep their normal layouts (k_scale must be the
    per-chunk fast path).  The return value is UNCHANGED —
    [b,hq,sq,d] — via one XLA transpose of the kernel's O^T output
    (fused into the consumer in real models).  Contiguous segment
    masks are supported (r4): under vt the ``q_segment_ids`` /
    ``kv_segment_ids`` args carry the per-q-row live-KV RANGE (lo / hi,
    both [b, sq]) instead of ids — ragged-pad hd64 shapes keep this
    orientation.  Explicit attn_mask / arbitrary segment ids /
    positions / smooth-q bias / per-row K scales / p_int8 / k_inkernel
    fall back to the normal orientation in core.py.

    Returns o [b,hq,sq,d] (and base-2 LSE [b,hq,sq] fp32 if return_lse).
    """
    if vt and vt_native:
        # NORMAL-layout Q/V consumed by the transposed kernel: the
        # operand transposes ride the MXU dimension_numbers instead of
        # XLA relayout passes (the r4 hd64 op-total gap was exactly
        # those Q^T/V^T passes, ~335 us at 4k).  Requires the in-kernel
        # Q quant (q_fold) — pre-quantized q keeps the transposed form.
        assert q_fold is not None, "vt_native requires in-kernel Q quant"
        b, hq, sq, d = q_i8.shape
        d_v = v_q.shape[-1]
    elif vt:
        b, hq, d, sq = q_i8.shape
        d_v = v_q.shape[-2]
    if vt:
        unsupported = [
            name for name, val in (
                ("attn_mask_i8", attn_mask_i8),
                ("attn_bias", attn_bias),
                ("q_positions", q_positions),
                ("score_col_bias", score_col_bias),
            ) if val is not None
        ]
        if unsupported or pv_compute == "int8" or k_inkernel:
            why = unsupported or (
                ["pv_compute='int8'"] if pv_compute == "int8"
                else ["k_inkernel"]
            )
            raise ValueError(
                f"vt=True does not support {why} "
                "— core.py routes these to the normal orientation"
            )
        # vt computes l as a cross-sublane VPU sum — CHEAP in this
        # orientation (the normal orientation's free-lane rowsum exists
        # to avoid the expensive cross-LANE sum; a ones-ROW analogue
        # measured 27% SLOWER: the +8 pad rows break int8 tiling)
        assert rowsum_lane is None, "vt computes l on the VPU"
    else:
        b, hq, sq, d = q_i8.shape
        d_v = v_q.shape[-1]
    assert rowsum_lane is None or d <= rowsum_lane < d_v
    hkv, sk = k_i8.shape[1], k_i8.shape[2]
    assert hq % hkv == 0, (hq, hkv)
    group = hq // hkv
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    sub_q = min(sub_q, block_q)
    chunk_k = min(chunk_k, block_k)
    assert sq % block_q == 0 and sk % block_k == 0, (sq, sk, block_q, block_k)
    n_q, n_kv = sq // block_q, sk // block_k
    # a ragged last chunk is allowed only when the whole KV row is one grid
    # step (global chunk boundaries must otherwise align with the K-scale
    # quantization groups)
    assert block_q % sub_q == 0
    assert block_k % chunk_k == 0 or n_kv == 1, (block_k, chunk_k, n_kv)
    if diag_chunk_k is not None:
        diag_chunk_k = min(diag_chunk_k, chunk_k)
        # the diagonal region's narrower chunks index K scales by global
        # column with the quantizer's group (== chunk_k); a non-divisor
        # would straddle scale groups and dequantize with the wrong scale
        assert chunk_k % diag_chunk_k == 0, (chunk_k, diag_chunk_k)
    n_chunks_total = -(-sk // chunk_k)
    # k_scale layout: per-row vector [b, hkv, sk] (reference-parity modes)
    # or one scalar per chunk [b, hkv, n_chunks_total] (fast path); with
    # k_inkernel the scales live in kernel scratch instead.
    if k_inkernel:
        k_scale_blocked = True
    else:
        k_scale_blocked = (
            k_scale.shape[-1] == n_chunks_total and n_chunks_total != sk
        )
        if k_scale.shape[-1] not in (sk, n_chunks_total):
            raise ValueError(
                f"k_scale last dim {k_scale.shape[-1]} must be kv_len "
                f"{sk} (per-row) or n_chunks {n_chunks_total} (per-chunk)"
            )
        if vt and not k_scale_blocked:
            raise ValueError(
                "vt=True requires per-chunk K scales (per-row scales "
                "would broadcast over sublanes; core.py routes per-row "
                "granularities to the normal orientation)"
            )

    has_v_scale = v_scale is not None
    has_v_mean = v_mean is not None
    has_segments = q_segment_ids is not None
    has_positions = q_positions is not None
    has_col_bias = score_col_bias is not None
    has_mask = attn_mask_i8 is not None
    has_bias = attn_bias is not None
    v_needs_cast = v_q.dtype != jnp.bfloat16
    p_int8 = pv_compute == "int8"
    if p_int8 and v_q.dtype != jnp.int8:
        raise ValueError(
            "pv_compute='int8' requires int8 V storage (pv_dtype='int8')"
        )
    if has_mask:
        hm = attn_mask_i8.shape[1]
        assert hm in (1, hq), (hm, hq)
        assert attn_mask_i8.shape == (b, hm, sq, sk), attn_mask_i8.shape
        attn_mask_i8 = attn_mask_i8.astype(jnp.int8)
    if has_bias:
        hb = attn_bias.shape[1]
        assert hb in (1, hq), (hb, hq)
        assert attn_bias.shape == (b, hb, sq, sk), attn_bias.shape

    # Single-KV-step specialization: when the whole KV row is one grid step
    # there is no online state to carry, so the scratch round-trips, the
    # pl.when regions, and the 4th grid dimension all drop away (measured
    # ~10% on the headline shape).
    single_step = n_kv == 1
    if kv_live is not None:
        assert single_step, "kv_live needs the whole KV row in one step"
        assert kv_live > 0 and sk - kv_live < chunk_k, (kv_live, sk)
    if k_inkernel:
        assert single_step, (
            "k_inkernel requires the whole-KV single-step grid (the K "
            "block must be resident across q blocks)"
        )
    # Band grid: for a block-aligned sliding window the kv grid dimension
    # shrinks to the live bandwidth (m_blocks + 1) and every index map
    # slides with the q block (phys kv = max(q - m, 0) + g) — blocks
    # outside the band never get grid steps at all, instead of iterating
    # and skipping.  At 16k W=4096 this removes 5 of 8 kv steps per q row.
    band_shift = None
    n_kv_grid = n_kv
    if (
        is_causal and window is not None and not single_step
        and block_q == block_k and window % block_k == 0
        and n_q == n_kv
    ):
        band_shift = window // block_k
        n_kv_grid = min(n_kv, band_shift + 1)
    # Fold grid: plain causal wastes the above-diagonal half of a
    # rectangular (n_q, n_kv) grid (steps iterate and skip).  Pairing q
    # rows f and n_q-1-f balances the triangle exactly: fold row f runs
    # row f's kv 0..f, then row n_q-1-f's kv 0..n_q-1-f — (n_kv + 1)
    # steps each, all live.  The grid shrinks from n_q*n_kv to
    # (n_q/2)*(n_kv+1) = the executed-triangle count (the TPU analogue
    # of persistent-CTA triangle scheduling).
    fold = None
    if (
        is_causal and window is None and not single_step
        and block_q == block_k and n_q == n_kv and n_q % 2 == 0
    ):
        fold = n_q - 1
        grid = (b, hq, n_q // 2, n_kv + 1)
    elif single_step:
        grid = (b, hq, n_q)
    else:
        grid = (b, hq, n_q, n_kv_grid)

    def _dec(iq, ik):
        # fold-grid decode: (fold row f, step j) -> (q block, kv block)
        first = ik <= iq
        q = jnp.where(first, iq, fold - iq)
        kv = jnp.where(first, ik, ik - iq - 1)
        return q, kv

    def mk(shape, f4, **kw):
        if single_step:
            return pl.BlockSpec(
                shape, lambda ib, ih, iq, f4=f4: f4(ib, ih, iq, 0), **kw
            )
        if fold is not None:
            return pl.BlockSpec(
                shape,
                lambda ib, ih, iq, ik, f4=f4: f4(ib, ih, *_dec(iq, ik)),
                **kw,
            )
        return pl.BlockSpec(shape, f4, **kw)

    def qm(ib, ih, iq, ik):
        return (ib, ih, iq, 0)

    if is_causal:
        # Clamp the KV block index for steps above the diagonal (and, for
        # sliding windows, below the left edge): the index map then
        # repeats the previous block and the Pallas pipeline emits no DMA
        # for it (the compute is skipped by pl.when), making the causal /
        # window early-exit free in bandwidth as well as FLOPs
        # (reference early-exit: sm89.cuh:225-229).
        def _clamp(iq, ik):
            if band_shift is not None:
                ik = ik + jnp.maximum(iq - band_shift, 0)
            hi = jnp.minimum(ik, (iq * block_q + block_q - 1) // block_k)
            if window is None or band_shift is not None:
                return hi
            lo = jnp.maximum(
                (iq * block_q - (window - 1)) // block_k, 0
            )
            return jnp.maximum(hi, lo)

        def km(ib, ih, iq, ik):
            return (ib, ih // group, _clamp(iq, ik), 0)

        def ksm(ib, ih, iq, ik):
            return (ib, ih // group, 0, _clamp(iq, ik))

        def kvsegm(ib, ih, iq, ik):
            return (ib, 0, _clamp(iq, ik))
    else:
        def km(ib, ih, iq, ik):
            return (ib, ih // group, ik, 0)

        def ksm(ib, ih, iq, ik):
            return (ib, ih // group, 0, ik)

        def kvsegm(ib, ih, iq, ik):
            return (ib, 0, ik)

    def ksm_all(ib, ih, iq, ik):
        return (ib, ih // group, 0, 0)

    # Scale/segment operands are reshaped so their trailing two dims satisfy
    # Mosaic's tile rules AND land in the kernel in broadcast-ready form:
    # Q-side vectors as columns [s, 1], KV-side vectors as rows [1, s].
    if k_inkernel:
        ks_spec = ks_in = None  # scales live in kernel scratch
    elif k_scale_blocked:
        # the whole per-chunk scale row rides in SMEM (tiny)
        ks_spec = mk(
            (1, 1, 1, n_chunks_total), ksm_all, memory_space=pltpu.SMEM
        )
        ks_in = k_scale.astype(jnp.float32)[:, :, None, :]
    else:
        ks_spec = mk((1, 1, 1, block_k), ksm)
        ks_in = k_scale.astype(jnp.float32)[:, :, None, :]  # [b,hkv,1,sk]
    if window is not None:
        if not is_causal:
            raise ValueError("window requires is_causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
    has_q_scale = q_scale is not None
    if has_q_scale:
        assert q_fold is None, "q_fold is for unquantized (bf16) q input"
    else:
        assert q_fold is not None, (
            "unquantized q requires q_fold (sm_scale*log2e)"
        )
        assert q_i8.dtype != jnp.int8, (
            "q_fold given but q is already int8"
        )
    if k_inkernel:
        assert k_scale is None and k_i8.dtype != jnp.int8, (
            "k_inkernel takes unquantized K and no k_scale"
        )
    def qm_t(ib, ih, iq, ik):
        # transposed q/o blocks: the q-block index rides the LAST axis
        return (ib, ih, 0, iq)

    if vt:
        if vt_native:
            # normal-layout Q (in-kernel quant reads bf16 rows; no
            # q_scale input in this mode)
            assert not has_q_scale, "vt_native quantizes Q in-kernel"
            in_specs = [mk((1, 1, block_q, d), qm)]
        else:
            in_specs = [mk((1, 1, d, block_q), qm_t)]
        inputs = [q_i8]
        if has_q_scale:
            in_specs.append(mk((1, 1, 1, block_q), qm_t))
            inputs.append(
                q_scale.astype(jnp.float32)[:, :, None, :]  # [b,hq,1,sq]
            )
        in_specs.append(mk((1, 1, block_k, d), km))
        inputs.append(k_i8)
        in_specs.append(ks_spec)
        inputs.append(ks_in)
        if vt_native:
            # normal-layout V blocks [block_k, d_v] (same map as K)
            in_specs.append(mk((1, 1, block_k, d_v), km))
        else:
            # V^T blocks [d_v, block_k] share the K-scale index map (head
            # divided by the GQA group, kv block possibly causal-clamped)
            in_specs.append(mk((1, 1, d_v, block_k), ksm))
        inputs.append(v_q)
        vchan_spec = mk(
            (1, 1, d_v, 1), lambda ib, ih, iq, ik: (ib, ih // group, 0, 0)
        )
        if has_v_scale:
            in_specs.append(vchan_spec)
            inputs.append(v_scale.astype(jnp.float32)[:, :, :, None])
        if has_v_mean:
            in_specs.append(vchan_spec)
            inputs.append(v_mean.astype(jnp.float32)[:, :, :, None])
    else:
        in_specs = [mk((1, 1, block_q, d), qm)]
        inputs = [q_i8]
        if has_q_scale:
            in_specs.append(mk((1, 1, block_q, 1), qm))
            inputs.append(
                q_scale.astype(jnp.float32)[..., None]  # [b,hq,sq,1]
            )
        in_specs.append(mk((1, 1, block_k, d), km))
        inputs.append(k_i8)
        if not k_inkernel:
            in_specs.append(ks_spec)
            inputs.append(ks_in)
        in_specs.append(mk((1, 1, block_k, d_v), km))
        inputs.append(v_q)
        vchan_spec = mk(
            (1, 1, 1, d_v), lambda ib, ih, iq, ik: (ib, ih // group, 0, 0)
        )
        if has_v_scale:
            in_specs.append(vchan_spec)
            inputs.append(v_scale.astype(jnp.float32)[:, :, None, :])
        if has_v_mean:
            in_specs.append(vchan_spec)
            inputs.append(v_mean.astype(jnp.float32)[:, :, None, :])
    if has_segments:
        if vt:
            # transposed orientation: q_segment_ids/kv_segment_ids carry
            # the per-q-row live-KV RANGE (lo / hi, both [b, sq]) — see
            # the vt branch in _compute_parts.  Both ride lane-major
            # [b, 1, sq] blocks (a [sk, 1] kv-id column would lane-pad
            # 128x: 9 MB VMEM at 17k seq).
            qrow_spec = mk(
                (1, 1, block_q), lambda ib, ih, iq, ik: (ib, 0, iq)
            )
            in_specs.append(qrow_spec)
            in_specs.append(qrow_spec)
            inputs.append(q_segment_ids.astype(jnp.int32)[:, None, :])
            inputs.append(kv_segment_ids.astype(jnp.int32)[:, None, :])
        else:
            in_specs.append(
                mk((1, block_q, 1), lambda ib, ih, iq, ik: (ib, iq, 0))
            )
            in_specs.append(mk((1, 1, block_k), kvsegm))
            inputs.append(
                q_segment_ids.astype(jnp.int32)[..., None])   # [b,sq,1]
            inputs.append(
                kv_segment_ids.astype(jnp.int32)[:, None, :])  # [b,1,sk]
    if has_positions:
        in_specs.append(
            mk((1, block_q, 1), lambda ib, ih, iq, ik: (ib, iq, 0))
        )
        in_specs.append(mk((1, 1, block_k), kvsegm))
        inputs.append(q_positions.astype(jnp.int32)[..., None])     # [b,sq,1]
        inputs.append(kv_positions.astype(jnp.int32)[:, None, :])   # [b,1,sk]
    if has_col_bias:
        # per-(b, hq) column bias (smooth_q correction, base-2 domain)
        if is_causal:
            def cbm(ib, ih, iq, ik):
                return (ib, ih, 0, _clamp(iq, ik))
        else:
            def cbm(ib, ih, iq, ik):
                return (ib, ih, 0, ik)
        in_specs.append(mk((1, 1, 1, block_k), cbm))
        inputs.append(score_col_bias.astype(jnp.float32)[:, :, None, :])
    if has_mask:
        mh = (lambda ih: ih) if hm > 1 else (lambda ih: 0)
        if is_causal:
            def mskm(ib, ih, iq, ik):
                return (ib, mh(ih), iq, _clamp(iq, ik))
        else:
            def mskm(ib, ih, iq, ik):
                return (ib, mh(ih), iq, ik)
        in_specs.append(mk((1, 1, block_q, block_k), mskm))
        inputs.append(attn_mask_i8)
    if has_bias:
        bh_ = (lambda ih: ih) if hb > 1 else (lambda ih: 0)
        if is_causal:
            def biasm(ib, ih, iq, ik):
                return (ib, bh_(ih), iq, _clamp(iq, ik))
        else:
            def biasm(ib, ih, iq, ik):
                return (ib, bh_(ih), iq, ik)
        in_specs.append(mk((1, 1, block_q, block_k), biasm))
        inputs.append(attn_bias)

    # per-(q block, kv block) any-live summary -> SMEM scalars for
    # whole-block compute skip in the multi-step kernel.  Built from the
    # explicit mask and/or the segment-id block ranges: two blocks whose
    # segment-id ranges are disjoint cannot attend (exact for sorted
    # varlen packing, conservative for arbitrary ids) — this turns the
    # segment-masked varlen grid from O(S^2) compute into a band
    # (the TPU analogue of the reference's cu_seqlens extent skipping,
    # attn_qk_int8_block_varlen.py:79-96).
    has_summary = (not single_step) and (has_mask or has_segments)
    if has_summary:
        sh = hm if has_mask else 1
        live = None
        if has_mask:
            live = jnp.max(
                attn_mask_i8.reshape(b, hm, n_q, block_q, n_kv, block_k),
                axis=(3, 5),
            ) > 0  # [b, hm, n_q, n_kv]
        if has_segments and vt:
            # range form (lo/hi per q row): a (q, kv) block is live iff
            # some q row's [lo, hi) intersects the kv block's span
            lob = q_segment_ids.astype(jnp.int32).reshape(b, n_q, block_q)
            hib = kv_segment_ids.astype(jnp.int32).reshape(
                b, n_q, block_q
            )
            lo_min, hi_max = lob.min(-1), hib.max(-1)  # [b, n_q]
            kv_start = jnp.arange(n_kv, dtype=jnp.int32) * block_k
            seg_live = jnp.logical_and(
                lo_min[:, :, None] < (kv_start + block_k)[None, None, :],
                hi_max[:, :, None] > kv_start[None, None, :],
            )[:, None]  # [b, 1, n_q, n_kv]
            live = seg_live if live is None else jnp.logical_and(
                live, seg_live
            )
        elif has_segments:
            qsb = q_segment_ids.astype(jnp.int32).reshape(b, n_q, block_q)
            kvb = kv_segment_ids.astype(jnp.int32).reshape(
                b, n_kv, block_k
            )
            qmin, qmax = qsb.min(-1), qsb.max(-1)      # [b, n_q]
            kvmin, kvmax = kvb.min(-1), kvb.max(-1)    # [b, n_kv]
            seg_live = jnp.logical_and(
                qmin[:, :, None] <= kvmax[:, None, :],
                qmax[:, :, None] >= kvmin[:, None, :],
            )[:, None]  # [b, 1, n_q, n_kv]
            live = seg_live if live is None else jnp.logical_and(
                live, seg_live
            )
        msum = live.astype(jnp.int32).reshape(b, sh, 1, n_q * n_kv)
        smh = (lambda ih: ih) if sh > 1 else (lambda ih: 0)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, n_q * n_kv),
                lambda ib, ih, iq, ik: (ib, smh(ih), 0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        inputs.append(msum)
    has_km = k_inkernel and k_mean is not None
    if has_km:
        in_specs.append(
            mk((1, 1, 1, d),
               lambda ib, ih, iq, ik: (ib, ih // group, 0, 0))
        )
        inputs.append(k_mean.astype(jnp.float32)[:, :, None, :])

    if vt and vt_o_normal:
        # the kernel transposes its O^T accumulator in the epilogue
        # (VMEM-local, amortized per block) and writes the public
        # [b,hq,sq,d] layout directly — no XLA O^T relayout pass.
        # LSE stays in its transposed [b,hq,1,sq] row form (tiny).
        out_shape = [jax.ShapeDtypeStruct((b, hq, sq, d), out_dtype)]
        out_specs = [mk((1, 1, block_q, d), qm)]
        if return_lse:
            out_shape.append(
                jax.ShapeDtypeStruct((b, hq, 1, sq), jnp.float32)
            )
            out_specs.append(mk((1, 1, 1, block_q), qm_t))
    elif vt:
        # the kernel writes O^T; one XLA swapaxes below restores the
        # public [b,hq,sq,d] layout (fused into the consumer in models)
        out_shape = [jax.ShapeDtypeStruct((b, hq, d, sq), out_dtype)]
        out_specs = [mk((1, 1, d, block_q), qm_t)]
        if return_lse:
            out_shape.append(
                jax.ShapeDtypeStruct((b, hq, 1, sq), jnp.float32)
            )
            out_specs.append(mk((1, 1, 1, block_q), qm_t))
    else:
        out_shape = [jax.ShapeDtypeStruct((b, hq, sq, d), out_dtype)]
        out_specs = [mk((1, 1, block_q, d), qm)]
        if return_lse:
            out_shape.append(
                jax.ShapeDtypeStruct((b, hq, sq, 1), jnp.float32)
            )
            out_specs.append(mk((1, 1, block_q, 1), qm))

    statics = dict(
        causal=is_causal,
        k_scale_blocked=k_scale_blocked,
        has_v_scale=has_v_scale,
        has_v_mean=has_v_mean,
        has_segments=has_segments,
        has_positions=has_positions,
        return_lse=return_lse,
        sub_q=sub_q,
        chunk_k=chunk_k,
        block_q=block_q,
        block_k=block_k,
        v_needs_cast=v_needs_cast,
        p_int8=p_int8,
        qk_int4=qk_int4,
        q_fold=q_fold,
        window=window,
        rowsum_lane=rowsum_lane,
        out_dtype=out_dtype,
        vt=vt,
        vt_native=vt_native,
        vt_o_normal=vt_o_normal,
    )
    if single_step:
        inner = functools.partial(
            _kernel_single, k_inkernel=k_inkernel, kv_live=kv_live,
            **statics
        )
    else:
        inner = functools.partial(
            _kernel, n_kv=n_kv, kv_shift=band_shift, fold=fold,
            diag_chunk_k=diag_chunk_k or chunk_k, **statics
        )

    def kernel(*refs):
        refs = list(refs)
        pos = 0
        q_ref = refs[pos]; pos += 1
        qs_ref = refs[pos] if has_q_scale else None
        pos += has_q_scale
        k_ref = refs[pos]; pos += 1
        ks_ref = refs[pos] if not k_inkernel else None
        pos += not k_inkernel
        v_ref = refs[pos]; pos += 1
        vs_ref = refs[pos] if has_v_scale else None
        pos += has_v_scale
        vm_ref = refs[pos] if has_v_mean else None
        pos += has_v_mean
        qseg_ref = refs[pos] if has_segments else None
        kseg_ref = refs[pos + 1] if has_segments else None
        pos += 2 * has_segments
        qpos_ref = refs[pos] if has_positions else None
        kpos_ref = refs[pos + 1] if has_positions else None
        pos += 2 * has_positions
        cbias_ref = refs[pos] if has_col_bias else None
        pos += has_col_bias
        mask_ref = refs[pos] if has_mask else None
        pos += has_mask
        bias_ref = refs[pos] if has_bias else None
        pos += has_bias
        msum_ref = refs[pos] if has_summary else None
        pos += has_summary
        km_ref = refs[pos] if has_km else None
        pos += has_km
        o_ref = refs[pos]
        lse_ref = refs[pos + 1] if return_lse else None
        args = (
            q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref, vm_ref,
            qseg_ref, kseg_ref, qpos_ref, kpos_ref, cbias_ref,
            mask_ref, bias_ref, msum_ref,
        )
        if single_step:
            scr = refs[-2:] if k_inkernel else ()
            inner(*args, km_ref, o_ref, lse_ref, *scr)
        else:
            inner(*args, o_ref, lse_ref, *refs[-2:])

    # FLOPs: 2*sq*sk*d (QK) + 2*sq*sk*d (PV) per (b, h); halved by causal.
    flops = 4 * b * hq * sq * sk * d // (2 if is_causal else 1)
    bytes_accessed = (
        q_i8.size * q_i8.dtype.itemsize  # bf16 when Q quantizes in-kernel
        + k_i8.size * group * k_i8.dtype.itemsize
        + v_q.size * group * v_q.dtype.itemsize
        + b * hq * sq * d * jnp.dtype(out_dtype).itemsize
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            (
                [
                    pltpu.VMEM((block_k, d), jnp.int8),
                    pltpu.SMEM((1, 1, 1, n_chunks_total), jnp.float32),
                ]
                if k_inkernel else []
            )
            if single_step else (
                [
                    # transposed running state: (m; l) in sublane rows
                    # 0/1 and O^T accumulator
                    pltpu.VMEM((8, block_q), jnp.float32),
                    pltpu.VMEM((d_v, block_q), jnp.float32),
                ]
                if vt else [
                    pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
                    pltpu.VMEM((block_q, d_v), jnp.float32),
                ]
            )
        ),
        compiler_params=pltpu.CompilerParams(
            # with in-kernel K quant the q axis carries scratch state
            dimension_semantics=(
                ("parallel", "parallel",
                 "arbitrary" if k_inkernel else "parallel")
                if single_step
                else ("parallel", "parallel", "parallel", "arbitrary")
            ),
            # The 16 MB scoped-vmem default is a compiler limit, not the
            # hardware's (v5e runs 120 MB scratch fine, measured); raise it
            # so block configs are chosen by measured speed, not the
            # default's artificial ceiling.
            vmem_limit_bytes=64 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=b * hq * sq * sk,
        ),
        interpret=interpret,
    )(*inputs)
    if vt and vt_o_normal:
        if return_lse:
            return outs[0], outs[1][:, :, 0, :]
        return outs[0]
    if vt:
        o = jnp.swapaxes(outs[0], 2, 3)
        if return_lse:
            return o, outs[1][:, :, 0, :]
        return o
    if return_lse:
        return outs[0], outs[1][..., 0]
    return outs[0]
