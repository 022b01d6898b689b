"""Round-3 extraction-cost shootout at 100k x 1024 (kernel-only timings).

The spill-verified r=2 insert measured 0.877 ms/batch kernel-only vs
approx 0.345 — the per-segment select chains run ~0.8 effective Tops
while the old k-round's lane REDUCTIONS hit ~2.8. Candidates to replace
the insert (all per-stride-class, [TQ, 2048] tile, 16 segments):

  approx      baseline: segment-loop max + id select        (~4 ops/elem)
  class2loop  maxmin m1/m2 chains + eq-based id1            (~6 ops/elem)
  class2resh  [TQ,16,128] reshape: max/argmax/mask/max axis1 (reductions)
  packed      i32 (score<<9|member) top-2 maxmin chains     (~3 ops/elem)
              (BQ/PQ-int8 exact: integer scores pack with member index,
               so ids ride the value chain for free)

    python tools/experiments/exp_stream2.py {approx,class2loop,class2resh,packed}
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import quantization_tpu as qt  # noqa: E402
from quantization_tpu.utils.compile_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "class2loop"
N, D, Q, CH = 100_000, 1024, 256, 8
TILE_N = 2048
SLOT = 128
NEG = -3.4e38

rng = np.random.default_rng(3)
data = rng.random((N, D), np.float32)
params = qt.VectorParameters(D, N, qt.DistanceType.DOT, False)
enc = qt.ScalarQuantizerU8.encode(data, params)
qq = rng.random((CH * Q, D), np.float32)
eq = enc.encode_query(qq)
qcs, qos = jnp.asarray(eq.codes), jnp.asarray(eq.offsets)

n = enc.codes.shape[0]
nt = n // TILE_N
ns = TILE_N // SLOT
SPAN = 8
nt_out = -(-nt // SPAN)


def extraction(scores, base, state):
    """Per-variant in-tile extraction; returns updated state tuple."""
    tq = scores.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, SLOT), 1)
    if VARIANT == "approx":
        m1, i1 = state
        for s in range(ns):
            seg = scores[:, s * SLOT : (s + 1) * SLOT]
            sid = base + s * SLOT + lane
            upd = seg > m1
            m1 = jnp.where(upd, seg, m1)
            i1 = jnp.where(upd, sid, i1)
        return (m1, i1)
    if VARIANT == "class2loop":
        m1, i1, m2 = state
        for s in range(ns):
            seg = scores[:, s * SLOT : (s + 1) * SLOT]
            sid = base + s * SLOT + lane
            t = jnp.minimum(m1, seg)       # loser of the top slot
            nm1 = jnp.maximum(m1, seg)
            i1 = jnp.where(seg == nm1, sid, i1)
            m2 = jnp.maximum(m2, t)
            m1 = nm1
        return (m1, i1, m2)
    if VARIANT == "class2resh":
        m1, i1, m2 = state
        s3 = scores.reshape(tq, ns, SLOT)
        tm1 = jnp.max(s3, axis=1)
        am = jnp.argmax(s3, axis=1).astype(jnp.int32)
        seg_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, ns, SLOT), 1)
        masked = jnp.where(seg_iota == am[:, None, :], NEG, s3)
        tm2 = jnp.max(masked, axis=1)
        ti1 = base + am * SLOT + lane
        # merge tile-local (tm1, ti1, tm2) into running block state:
        # top-2-of-two-pairs via the min(h1,h2) trick (m1-only ids).
        hi = jnp.maximum(m1, tm1)
        lo = jnp.minimum(m1, tm1)
        i1 = jnp.where(tm1 == hi, ti1, i1)
        m2 = jnp.maximum(jnp.maximum(m2, tm2), lo)
        m2 = jnp.minimum(m2, hi)  # keep m2 <= m1 invariant on ties
        return (hi, i1, m2)
    if VARIANT == "packed":
        # int scores (simulating BQ/PQ-int8): here we just bitcast-trunc
        # the f32 scores to a monotonic i24 and pack 9 member bits.
        (p1, p2) = state
        member0 = base // SLOT  # segment-class member index of seg 0
        for s in range(ns):
            seg = scores[:, s * SLOT : (s + 1) * SLOT]
            si = (
                jax.lax.bitcast_convert_type(seg, jnp.int32) >> 9
            ) << 9 | (member0 + s)
            t = jnp.minimum(p1, si)
            p1 = jnp.maximum(p1, si)
            p2 = jnp.maximum(p2, t)
        return (p1, p2)
    raise SystemExit(f"unknown variant {VARIANT}")


def init_state(tq):
    f = jnp.full((tq, SLOT), NEG, jnp.float32)
    i = jnp.full((tq, SLOT), -1, jnp.int32)
    ipk = jnp.full((tq, SLOT), -(2**31 - 1), jnp.int32)
    if VARIANT == "approx":
        return (f, i)
    if VARIANT == "class2loop" or VARIANT == "class2resh":
        return (f, i, f)
    return (ipk, ipk)


def make_kernel():
    n_out = len(init_state(1))

    def kernel(mult_ref, q_ref, c_ref, qoff_ref, voff_ref, *out_refs):
        j = pl.program_id(1)
        acc = jax.lax.dot_general(
            q_ref[:], c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = (
            mult_ref[0] * acc.astype(jnp.float32) + qoff_ref[:] + voff_ref[:]
        )
        base = j * TILE_N

        @pl.when(j % SPAN == 0)
        def _init():
            st = init_state(scores.shape[0])
            for r, s in zip(out_refs, st):
                r[:] = s

        st = tuple(r[:] for r in out_refs)
        st = extraction(scores, base, st)
        for r, s in zip(out_refs, st):
            r[:] = s

    return kernel, n_out


def run(qc, qo):
    kernel, n_out = make_kernel()
    dts = init_state(1)
    out_specs = [
        pl.BlockSpec((Q, SLOT), lambda i, j: (i, j // SPAN),
                     memory_space=pltpu.VMEM)
        for _ in range(n_out)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Q, nt_out * SLOT), a.dtype) for a in dts
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(1, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Q, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(
        enc._mult_dev.reshape(1).astype(jnp.float32),
        qc,
        enc.codes,
        qo.reshape(-1, 1).astype(jnp.float32),
        enc.voffsets.reshape(1, -1).astype(jnp.float32),
    )
    return sum(jnp.max(o.astype(jnp.float32)) for o in outs)


@jax.jit
def chain(qcs, qos):
    outs = []
    for c in range(CH):
        qc = jax.lax.dynamic_slice_in_dim(qcs, c * Q, Q, 0)
        qo = jax.lax.dynamic_slice_in_dim(qos, c * Q, Q, 0)
        outs.append(run(qc, qo))
    return jnp.stack(outs)


t0 = time.time()
r = chain(qcs, qos)
np.asarray(r)
print(f"{VARIANT}: compile {time.time()-t0:.0f}s", flush=True)
reps = 8
t0 = time.time()
for _ in range(reps):
    r = chain(qcs, qos)
np.asarray(r)
dt = (time.time() - t0) / reps / CH
print(f"{VARIANT}: {dt*1e3:.3f} ms/batch ({Q/dt:.0f} qps)", flush=True)
