"""Is the v5e's native int8 MXU rate (~2x bf16, 394 TOPS paper) reachable
through Mosaic `dot_general`?  (VERDICT r2 item #1.)

Minimal Pallas GEMM kernels with ZERO ancillary VPU work: one dot per grid
step, f32/int32 VMEM accumulator, store-on-last-k.  Rate from the slope
over two K depths at fixed M, N — cancels dispatch overhead AND the
output-write cost, isolating the K-loop steady state (dominated by the MXU
dot + input DMA).

Variants: bf16xbf16->f32 (baseline), int8xint8->int32 (the target),
bf16xint8->f32 (the folded attention dot), int8 at deeper K blocks
(native int8 mode may want longer contractions), and the XLA-level int8
matmul for reference.
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

M = N = 4096


def gemm_kernel(x_ref, y_ref, o_ref, acc_ref, *, nk):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...], y_ref[...], preferred_element_type=acc_ref.dtype
    )

    @pl.when(pl.program_id(2) == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def make_gemm(K, bm, bn, bk, xd, yd, accd):
    nk = K // bk
    kern = functools.partial(gemm_kernel, nk=nk)

    def f(x, y):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), accd),
            grid=(M // bm, N // bn, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), accd)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x, y)

    return jax.jit(f)


def inputs(K, xd, yd):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    if xd == jnp.int8:
        x = jax.random.randint(kx, (M, K), -127, 127, jnp.int8)
    else:
        x = jax.random.normal(kx, (M, K), xd)
    if yd == jnp.int8:
        y = jax.random.randint(ky, (K, N), -127, 127, jnp.int8)
    else:
        y = jax.random.normal(ky, (K, N), yd)
    return x, y


def rate(tag, bm, bn, bk, xd, yd, accd, k1=4096, k2=16384):
    try:
        ts = []
        for K in (k1, k2):
            f = make_gemm(K, bm, bn, bk, xd, yd, accd)
            x, y = inputs(K, xd, yd)
            f(x, y)
            t = min(
                measure(f, x, y, iters=10, warmup=2, trains=3)
                for _ in range(2)
            )
            ts.append(t)
        fl = 2 * M * N * (k2 - k1)
        tf = fl / (ts[1] - ts[0]) / 1e12
        print(f"{tag:42s} blocks ({bm},{bn},{bk}): {tf:7.1f} TF/s "
              f"(t1 {ts[0]*1e3:.2f} ms, t2 {ts[1]*1e3:.2f} ms)", flush=True)
        return tf
    except Exception as e:  # noqa: BLE001
        print(f"{tag:42s} blocks ({bm},{bn},{bk}): FAILED "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        return None


def xla_rate(tag, xd, yd, accd, k1=4096, k2=16384):
    ts = []
    for K in (k1, k2):
        x, y = inputs(K, xd, yd)
        f = jax.jit(
            lambda x, y: jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=accd,
            )
        )
        f(x, y)
        ts.append(min(
            measure(f, x, y, iters=10, warmup=2, trains=3)
            for _ in range(2)
        ))
    fl = 2 * M * N * (k2 - k1)
    print(f"{tag:42s} XLA: {fl / (ts[1] - ts[0]) / 1e12:7.1f} TF/s",
          flush=True)


def main():
    bf, i8, f32, i32 = jnp.bfloat16, jnp.int8, jnp.float32, jnp.int32
    # Baselines (within-run):
    rate("bf16 x bf16 -> f32", 512, 512, 512, bf, bf, f32)
    xla_rate("XLA bf16 x bf16", bf, bf, f32)
    # The target:
    rate("int8 x int8 -> int32", 512, 512, 512, i8, i8, i32)
    rate("int8 x int8 -> int32", 512, 512, 1024, i8, i8, i32)
    rate("int8 x int8 -> int32", 512, 512, 2048, i8, i8, i32)
    rate("int8 x int8 -> int32", 1024, 1024, 512, i8, i8, i32)
    rate("int8 x int8 -> int32", 256, 256, 2048, i8, i8, i32)
    rate("int8 x int8 -> f32 acc", 512, 512, 512, i8, i8, f32)
    xla_rate("XLA int8 x int8 -> int32", i8, i8, i32)
    # The folded attention dot:
    rate("bf16 x int8 -> f32", 512, 512, 512, bf, i8, f32)
    rate("bf16 x int8 -> f32", 512, 512, 1024, bf, i8, f32)


if __name__ == "__main__":
    main()
