"""Pure in-kernel MXU rate vs dot shape.

One Pallas kernel, VMEM-resident operands, no DMA in the loop: measures
the achievable MXU rate for the exact dot shapes flash attention uses
(QK: K=d contraction; PV: N=d output) vs square dots, to find whether
the ~97 TF/s dots ceiling at d=128 is a hardware shape effect or a
Pallas scheduling artifact.  Run SOLO on the TPU.
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

REPS = 16  # dots per grid step


def kernel(a_ref, b_ref, o_ref, acc, *, shape, trans_rhs=False):
    m, n, k = shape
    a = a_ref[...]
    b = b_ref[...]

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    out = acc[...]
    kmax = a.shape[1]
    for t in range(REPS):
        # distinct slice pair per rep so the compiler can't CSE any dot
        offa = (t * 31) % (kmax - k + 1) if kmax > k else 0
        span = (kmax - n + 1) if trans_rhs else (kmax - k + 1)
        offb = ((t * 61) + 7) % max(span, 1)
        aa = a[:, offa:offa + k]
        if trans_rhs:
            # b pool is [kmax, n] but holds a [n-major] view: slice [n, k]
            bb = b[offb:offb + n, :k] if b.shape[1] >= k else None
            s = jax.lax.dot_general(
                aa, bb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            bb = b[offb:offb + k, :n]
            s = jax.lax.dot(aa, bb, preferred_element_type=jnp.float32)
        if n >= 128:
            out = out + s[:, :128]
        else:
            out = out + jnp.pad(s, ((0, 0), (0, 128 - n)))

    acc[...] = out

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc[...]


def run(m, n, k, steps=64, trans_rhs=False):
    kmax = max(k, 1024)
    bshape = (kmax, max(k, n)) if trans_rhs else (kmax, n)
    a = jax.random.normal(jax.random.PRNGKey(0), (m, kmax), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), bshape, jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(kernel, shape=(m, n, k), trans_rhs=trans_rhs),
        grid=(steps,),
        in_specs=[pl.BlockSpec((m, kmax), lambda i: (0, 0)),
                  pl.BlockSpec(bshape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((m, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    fj = jax.jit(f)
    fj(a, b)
    t = measure(fj, a, b, iters=20, warmup=3)
    fl = 2 * m * n * k * REPS * steps
    tag = "T" if trans_rhs else " "
    print(f"M{m:5d} N{n:5d} K{k:5d}{tag}  {fl / t / 1e12:7.1f} TF/s")
    sys.stdout.flush()


def main():
    for m, n, k, tr in [
        (512, 512, 128, True),    # QK as the kernel does it (k[N,K])
        (1024, 1024, 128, True),
        (1024, 512, 128, True),
        (2048, 512, 128, True),
        (512, 512, 128, False),   # plain-dot comparisons
        (1024, 1024, 128, False),
        (512, 128, 1024, False),  # PV, longer contraction
        (1024, 128, 1024, False),
        (2048, 128, 512, False),
        (1024, 128, 512, False),
    ]:
        run(m, n, k, trans_rhs=tr)


if __name__ == "__main__":
    main()
