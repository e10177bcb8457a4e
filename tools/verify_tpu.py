"""End-to-end TPU verification harness: drive the public API on the real
chip against an independent fp32 oracle.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python tools/verify_tpu.py
Exits nonzero if any check regresses.  (Also runnable on CPU; slower.)
"""
import os
import sys

import jax

# honor JAX_PLATFORMS=cpu even though the axon site package clobbers
# the env var during its own jax import (see tests/conftest.py)
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import sageattention_tpu as sa

print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)


def oracle(q, k, v, is_causal=False):
    b, h, s, d = q.shape
    hkv = k.shape[1]
    if hkv != h:
        k = jnp.repeat(k, h // hkv, axis=1)
        v = jnp.repeat(v, h // hkv, axis=1)
    s_ = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * d**-0.5
    if is_causal:
        sq, sk = s_.shape[-2:]
        mask = (jnp.arange(sk)[None, :] <= jnp.arange(sq)[:, None])
        s_ = jnp.where(mask, s_, -1e30)
    p = jax.nn.softmax(s_, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


def cos(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def check(name, o, ref, thresh=0.999):
    c = cos(o, ref)
    mx = float(np.max(np.abs(np.asarray(o, np.float32) - np.asarray(ref, np.float32))))
    status = "OK " if c > thresh and np.isfinite(mx) else "BAD"
    print(f"{status} {name}: cosine={c:.6f} maxabs={mx:.4f}", file=sys.stderr)
    return status == "OK "


ok = True
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (2, 8, 4096, 128), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4096, 128), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 4096, 128), jnp.bfloat16)

# 1. default path (drop-in SDPA replacement)
o = sa.sageattn(q, k, v)
ok &= check("sageattn default (4k, hd128)", o, oracle(q, k, v))

# 2. causal
o = sa.sageattn(q, k, v, is_causal=True)
ok &= check("sageattn causal", o, oracle(q, k, v, is_causal=True))

# 3. GQA + NHD layout
kg = k[:, :2]; vg = v[:, :2]
o = sa.sageattn(jnp.swapaxes(q, 1, 2), jnp.swapaxes(kg, 1, 2),
                jnp.swapaxes(vg, 1, 2), tensor_layout="NHD")
ok &= check("sageattn GQA NHD", jnp.swapaxes(o, 1, 2), oracle(q, kg, vg))

# 4. return_lse + ring-merge identity: split KV in two, merge partials
o_full, lse_full = sa.sageattn(q, k, v, return_lse=True)
o1, l1 = sa.sageattn(q, k[:, :, :2048], v[:, :, :2048], return_lse=True)
o2, l2 = sa.sageattn(q, k[:, :, 2048:], v[:, :, 2048:], return_lse=True)
from sageattention_tpu.ops.reference import merge_attention_partials
o_m, lse_m = merge_attention_partials([o1, o2], [l1, l2])
# two independently quantized computations agree to ~1e-4, not machine eps
ok &= check("ring-merge == full", o_m, o_full, 0.999)
lse_err = float(np.max(np.abs(np.asarray(lse_m - lse_full))))
print(f"{'OK ' if lse_err < 0.05 else 'BAD'} lse merge maxerr={lse_err:.5f}",
      file=sys.stderr)
ok &= lse_err < 0.05

# 5. PROBE: odd sequence length (padding path), small head dim
qo = q[:, :, :3000, :64]; ko = k[:, :, :2900, :64]; vo = v[:, :, :2900, :64]
o = sa.sageattn(qo, ko, vo)
ok &= check("odd lens 3000x2900 hd64", o, oracle(qo, ko, vo))

# 6. PROBE: per-backend entry points
o = sa.sageattn_qk_int8_pv_bf16(q, k, v)
ok &= check("pv bf16 entry", o, oracle(q, k, v))
o = sa.sageattn_qk_int8_pv_int8(q, k, v, smooth_v=True)
ok &= check("pv int8 smooth_v entry", o, oracle(q, k, v))

# 7. PROBE: varlen packed API
qv = jnp.reshape(jnp.swapaxes(q[:1, :, :1024], 1, 2), (1024, 8, 128))
kv_ = jnp.reshape(jnp.swapaxes(k[:1, :, :1024], 1, 2), (1024, 8, 128))
vv = jnp.reshape(jnp.swapaxes(v[:1, :, :1024], 1, 2), (1024, 8, 128))
cu = jnp.array([0, 300, 1024], jnp.int32)
ov = sa.sageattn_varlen(qv, kv_, vv, cu, cu)
# oracle per segment
o_a = oracle(q[:1, :, :300], k[:1, :, :300], v[:1, :, :300])
o_b = oracle(q[:1, :, 300:1024], k[:1, :, 300:1024], v[:1, :, 300:1024])
ref_v = jnp.concatenate([o_a, o_b], axis=2)
ok &= check("varlen 2-seg", jnp.swapaxes(ov, 0, 1)[None], ref_v)

# 8. PROBE: degenerate tiny shape
qt = q[:1, :1, :7, :32]; kt = k[:1, :1, :5, :32]; vt = v[:1, :1, :5, :32]
o = sa.sageattn(qt, kt, vt)
ok &= check("tiny 7x5 hd32", o, oracle(qt, kt, vt), 0.995)

# 9. PROBE: decode over the int8 KV cache (GQA group 4, ragged lengths)
cache = sa.init_kv_cache(2, 2, 1024, 128)
lens0 = jnp.zeros((2,), jnp.int32)
kd, vd = k[:2, :2, :700], v[:2, :2, :700]
cache, lens = sa.append_kv(cache, lens0, kd, vd)
lens = jnp.array([700, 500], jnp.int32)
qd = q[:2, :8, :1]
od = sa.sageattn_decode(qd, cache, lens)
refs = []
for bi, L in enumerate([700, 500]):
    kr = jnp.repeat(kd[bi:bi+1, :, :L], 4, axis=1)
    vr = jnp.repeat(vd[bi:bi+1, :, :L], 4, axis=1)
    refs.append(oracle(qd[bi:bi+1], kr, vr))
ok &= check("decode int8-cache ragged GQA", od, jnp.concatenate(refs))

# 10. PROBE: sliding-window decode (reads only the window's chunks)
W = 256
odw = sa.sageattn_decode(qd, cache, lens, window=W)
refs_w = []
for bi, L in enumerate([700, 500]):
    kr = jnp.repeat(kd[bi:bi+1, :, L - W:L], 4, axis=1)
    vr = jnp.repeat(vd[bi:bi+1, :, L - W:L], 4, axis=1)
    refs_w.append(oracle(qd[bi:bi+1], kr, vr))
ok &= check("decode window=256 ragged", odw, jnp.concatenate(refs_w))

# 11. PROBE: packed-int4 cache (bits=4) + calibrated means
c4 = sa.init_kv_cache(2, 2, 1024, 128, bits=4)
c4 = sa.calibrate(c4, kd, vd)
c4, _ = sa.append_kv(c4, lens0, kd, vd)
o4 = sa.sageattn_decode(qd, c4, lens)
ok &= check("decode int4-cache calibrated", o4, jnp.concatenate(refs),
            0.98)
# int4-vs-int8 parity ON HARDWARE (ADVICE r3): CI only exercises the
# interpret-mode emulation of pltpu.bitcast nibble unpack and the dual
# int4 MXU dot; a Mosaic ordering / int4-dot discrepancy would return
# garbage while CI stays green.  The two caches quantize independently
# (int4 is coarser), so the bar is cosine, not exactness.
ok &= check("decode int4 vs int8 parity (hw bitcast)", o4, od, 0.985)

# 12. PROBE: chunked prefill (extend block, t_q=64 with causal tail)
t_ext = 64
qe = q[:2, :8, :t_ext]
oe = sa.sageattn_decode(qe, cache, lens)
refs_e = []
for bi, L in enumerate([700, 500]):
    kr = jnp.repeat(kd[bi:bi+1, :, :L], 4, axis=1)
    vr = jnp.repeat(vd[bi:bi+1, :, :L], 4, axis=1)
    # row t (global pos L - t_ext + t) sees keys <= its position
    sc = jnp.einsum(
        "bhqd,bhkd->bhqk", qe[bi:bi+1].astype(jnp.float32),
        kr.astype(jnp.float32),
    ) * 128**-0.5
    col = jnp.arange(L)[None, None, None, :]
    row = jnp.arange(t_ext)[None, None, :, None]
    sc = jnp.where(col <= L - t_ext + row, sc, -jnp.inf)
    refs_e.append(jnp.einsum(
        "bhqk,bhkd->bhqd", jax.nn.softmax(sc, axis=-1),
        vr.astype(jnp.float32),
    ))
ok &= check("chunked-prefill extend t_q=64", oe,
            jnp.concatenate(refs_e))

# 13. PROBE: paged decode (scrambled page table, scalar-prefetch gather)
page = 256
n_pages = 2 * (1024 // page)
table = jnp.array(
    [[5, 2, 7, 0], [3, 6, 1, 4]], jnp.int32
)  # scrambled ownership of the 8-page pool
pc = sa.init_paged_kv_cache(n_pages, 2, 128, table, page_size=page)
pc, plens = sa.paged_append(pc, lens0, kd, vd)
op = sa.sageattn_paged_decode(qd, pc, lens)
ok &= check("paged decode scrambled table", op, jnp.concatenate(refs))
opw = sa.sageattn_paged_decode(qd, pc, lens, window=W)
ok &= check("paged decode window=256", opw, jnp.concatenate(refs_w))

# 14. PROBE: lazy softmax x vt orientation ON HARDWARE (VERDICT r4 #9):
# a planted ~100-base-2-unit logit spread with the spike in the LAST KV
# chunk.  The vt kernel's m_ref reference comes from the first chunk, so
# later-chunk p values reach exp2(~100) before the merge renormalizes —
# interpret-mode certifies the math (tests/test_lazy_softmax.py), this
# certifies the REAL Mosaic lowering of the vt m_ref scratch orientation
# (attention_pallas.py _compute_parts lazy branch).
sl, dl = 1024, 64
ql = jax.random.normal(jax.random.PRNGKey(40), (1, 2, sl, dl),
                       jnp.bfloat16) * 0.1
kl = jax.random.normal(jax.random.PRNGKey(41), (1, 2, sl, dl),
                       jnp.bfloat16) * 0.1
vl = jax.random.normal(jax.random.PRNGKey(42), (1, 2, sl, dl),
                       jnp.bfloat16)
w = jnp.full((dl,), 8.0**0.5 / dl**0.5, jnp.float32)  # |w|^2 = 8
spread_nat = 100.0 / 1.4426950408889634  # ~100 base-2 units
# logit(row 3, col sl-7) = spread_nat after the 1/sqrt(64) sm_scale
ql = ql.at[0, :, 3, :].set((w * spread_nat).astype(jnp.bfloat16))
kl = kl.at[0, :, sl - 7, :].set(w.astype(jnp.bfloat16))
o = sa.sageattn(ql, kl, vl)
ok &= check("lazy-softmax 100-unit spread (vt hd64)", o,
            oracle(ql, kl, vl))
ok &= not bool(jnp.any(jnp.isnan(o)))

# 15. PROBE: in-kernel additive bias (r5: bias rides the fused kernel,
# reference: triton/attn_qk_int8_per_thread.py:49-56) with -inf rows
bshape = (1, 1, 2048, 2048)
bias = jax.random.normal(jax.random.PRNGKey(43), bshape) * 2.0
bias = bias.at[:, :, 11, :].set(-jnp.inf)  # one fully-dead q row
qb, kb, vb = q[:1, :4, :2048], k[:1, :4, :2048], v[:1, :4, :2048]
o = sa.sageattn(qb, kb, vb, attn_bias=bias)
s_ = jnp.einsum("bhqd,bhkd->bhqk", qb.astype(jnp.float32),
                kb.astype(jnp.float32)) * 128**-0.5 + bias
p_ = jax.nn.softmax(s_, axis=-1)
ref_b = jnp.einsum("bhqk,bhkd->bhqd", p_, vb.astype(jnp.float32))
live_rows = np.ones(2048, bool); live_rows[11] = False
ok &= check("in-kernel additive bias 2k/hd128",
            o[:, :, live_rows], ref_b[:, :, live_rows])
ok &= float(jnp.max(jnp.abs(o[:, :, 11]))) == 0.0
ok &= not bool(jnp.any(jnp.isnan(o)))

print("ALL OK" if ok else "SOME FAILED", file=sys.stderr)
sys.exit(0 if ok else 1)
