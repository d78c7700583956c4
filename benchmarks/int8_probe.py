"""Int8 MXU probe, part 1: FIDELITY of int8-quantized Chebyshev conv
matmuls vs the current bf16 ingestion, at the conv-output level.

v5e runs int8 matmuls at 2x bf16 MXU throughput with EXACT int32
accumulation (no truncation growth with the reduction length K = A —
the measured bf16 size-coupling would vanish). The question is whether
8-bit operand quantization fits inside the headline force-error budget
(7e-3 max rel vs fp32-exact; the bf16 conv floor measures ~6e-3).

Protocol: build the real fitted series (c, c2) on the zoo geometry,
materialize the T~_m(Z) matrices from real pair z, take the block-0
input activations x (the type embedding, like the real first conv), and
compare sum_m c_m * (T~_m @ x) computed with
  - fp64 matmuls                         (oracle)
  - fp32 ingestion                       (parity path)
  - bf16 ingestion                       (current headline)
  - int8 per-ROW scales on T~, per-COLUMN scales on x, int32 accumulate
    (emulated exactly in fp32: products <= 127^2, K = 266 -> sums < 2^24)
Output error is max |out - oracle| / max|oracle| over all entries.

Run: env PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/int8_probe.py
(CPU is fine — the emulation is platform-independent rounding.)
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from flashmd_tpu.data.system import collate
from flashmd_tpu.models.cheb import attach_cheb_fit, _pair_z
from flashmd_tpu.models.zoo import cgschnet_1enh_like

ORDER = int(os.environ.get("ORDER", "64"))
DMIN = float(os.environ.get("DMIN", "2.0"))
N_ATOMS = int(os.environ.get("N_ATOMS", "266"))

ff, configs = cgschnet_1enh_like(
    n_atoms=N_ATOMS, batch_size=1, precision="fp32", message_passing="xla"
)
cfg = dataclasses.replace(
    ff.schnet_config, precision="bf16", message_passing="cheb",
    cheb_order=ORDER, cheb_d_min=DMIN,
)
params = attach_cheb_fit(ff.schnet_params, cfg)
c, c2, w0 = params["cheb_fit"][0]
c = np.asarray(c, np.float64)              # [M, F]

pos = np.asarray(configs[0].pos, np.float64)
_, z = _pair_z(jnp.asarray(pos), cfg.cutoff.cutoff_upper, None, DMIN)
z = np.asarray(z, np.float64)              # [A, A]

# real block-0 input: the type embedding rows
emb = np.asarray(params["embedding"], np.float64)
x = emb[np.asarray(configs[0].atom_types)]  # [A, F]

# materialize T~_m = (1-z)^2 T_m(z)
A = z.shape[0]
u2 = (1.0 - z) ** 2
T = np.empty((ORDER, A, A))
T[0] = u2
T[1] = u2 * z
for m in range(2, ORDER):
    T[m] = 2.0 * z * T[m - 1] - T[m - 2]


w0 = np.asarray(w0, np.float64)


def conv(matmul):
    out = np.zeros((A, c.shape[1]))
    for m in range(ORDER):
        out += c[m][None, :] * matmul(T[m], x)
    # Self-pair removal, exactly as the real forward applies it
    # (models/cheb.py _cheb_forward_only: an exact fp32 elementwise op,
    # not part of the quantized matmuls) — without it the oracle's
    # normalizing max would include the coherent self-pair term.
    return out - w0[None, :] * x


def mm_f64(t, xx):
    return t @ xx


def mm_cast(dtype):
    def mm(t, xx):
        return np.asarray(
            jnp.dot(
                jnp.asarray(t, dtype), jnp.asarray(xx, dtype),
                preferred_element_type=jnp.float32,
            ),
            np.float64,
        )
    return mm


def mm_int8(t, xx):
    # per-row scale on T (rows are destination atoms; max |row| sets it)
    st = np.abs(t).max(axis=1, keepdims=True) / 127.0
    st = np.where(st == 0, 1.0, st)
    qt = np.clip(np.rint(t / st), -127, 127)
    # per-column scale on x (feature channels)
    sx = np.abs(xx).max(axis=0, keepdims=True) / 127.0
    sx = np.where(sx == 0, 1.0, sx)
    qx = np.clip(np.rint(xx / sx), -127, 127)
    acc = qt @ qx  # exact in fp64; int32 on hardware
    return st * acc * sx


oracle = conv(mm_f64)
scale = np.abs(oracle).max()
for name, mm in [
    ("fp32", mm_cast(jnp.float32)),
    ("bf16", mm_cast(jnp.bfloat16)),
    ("int8", mm_int8),
]:
    err = np.abs(conv(mm) - oracle).max() / scale
    print(f"{name:>6}: max rel conv-output err = {err:.2e}", flush=True)

# decomposed: which operand's quantization dominates?
def q8_rows(t):
    s = np.abs(t).max(axis=1, keepdims=True) / 127.0
    s = np.where(s == 0, 1.0, s)
    return s * np.clip(np.rint(t / s), -127, 127)


def q8_cols(xx):
    s = np.abs(xx).max(axis=0, keepdims=True) / 127.0
    s = np.where(s == 0, 1.0, s)
    return s * np.clip(np.rint(xx / s), -127, 127)


err_t = np.abs(conv(lambda t, xx: q8_rows(t) @ xx) - oracle).max() / scale
err_x = np.abs(conv(lambda t, xx: t @ q8_cols(xx)) - oracle).max() / scale
print(f"int8-T-only: {err_t:.2e}   int8-x-only: {err_x:.2e}", flush=True)
