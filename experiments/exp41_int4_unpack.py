"""exp41 (round 5): int4 nibble-unpack variants (VERDICT r4 item 6).

The shared-byte int4 decode kernel pays an int32-widened nibble unpack
over every K AND V element (Mosaic historically lowered no 8-bit vector
arithmetic) — pure VPU overhead in a bandwidth-bound kernel that cancels
the 4× byte win (docs/perf_notes.md "int4 decode is a CAPACITY feature").

Variants measured here, inside a decode-shaped kernel (byte tile →
unpack → int8 MXU dot, grid over tiles):

  int32  — current production: widen to i32, mask/shift/sub, cast to i8
  int16  — same arithmetic in i16 (half the widened vector words)
  int8   — direct i8 vector ops (does the current toolchain lower them?)
  split  — lo via (b & 15) - 8 on i32; hi via ARITHMETIC right shift
           (b >> 4 on the SIGNED byte widened once) — saves the second
           mask: hi_signed = (b_i32 >> 4) with b in [-128,127] gives the
           signed high nibble directly in [-8, 7] (two ops instead of
           three).

Also prints a lowering probe per variant (compile-or-crash).

Usage: exp41_int4_unpack.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from metal_flash_attention_plus_tpu.utils.profiling import measure  # noqa: E402

R, D = 512, 256  # per-tile rows × unpacked cols (bytes: R × D/2)
NT = 64  # grid tiles


def unpack_variant(byte, kind):
    if kind == "int32":
        wide = byte.astype(jnp.int32)
        lo = ((wide & 0xF) - 8).astype(jnp.int8)
        hi = (((wide >> 4) & 0xF) - 8).astype(jnp.int8)
    elif kind == "int16":
        wide = byte.astype(jnp.int16)
        lo = ((wide & 0xF) - 8).astype(jnp.int8)
        hi = (((wide >> 4) & 0xF) - 8).astype(jnp.int8)
    elif kind == "int8":
        lo = (byte & 0xF) - 8
        hi = ((byte >> 4) & 0xF) - 8
    elif kind == "split":
        # byte stored as SIGNED i8 where the high nibble is the V (or K)
        # payload's signed value << 4: arithmetic >> 4 recovers it with
        # no mask; low nibble still needs mask+offset.
        wide = byte.astype(jnp.int32)
        lo = ((wide & 0xF) - 8).astype(jnp.int8)
        hi = (wide >> 4).astype(jnp.int8)  # arithmetic shift: signed hi
    else:
        raise ValueError(kind)
    return jnp.concatenate([lo, hi], axis=1)


def kernel(q_ref, b_ref, o_ref, acc, *, kind):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = unpack_variant(b_ref[0], kind)  # [R, D]
    acc[...] += jax.lax.dot_general(
        q_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(t == pl.num_programs(0) - 1)
    def _s():
        o_ref[...] = acc[...]


def build(kind):
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    q = jax.random.randint(ks[0], (128, D), -127, 127, jnp.int8)
    if kind == "int8":
        byte = jax.random.randint(
            ks[1], (NT, R, D // 2), 0, 255, jnp.uint8
        )
    else:
        byte = jax.random.randint(
            ks[1], (NT, R, D // 2), -128, 127, jnp.int8
        )
    f = pl.pallas_call(
        functools.partial(kernel, kind=kind),
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((128, D), lambda t: (0, 0)),
            pl.BlockSpec((1, R, D // 2), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((128, R), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((128, R), jnp.int32),
        scratch_shapes=[pltpu.VMEM((128, R), jnp.int32)],
    )
    fj = jax.jit(lambda q, byte: f(q, byte))
    return fj, q, byte


def main():
    base = None
    # int8-payload CONTROL: same kernel shape, no unpack (reads 2× the
    # bytes but runs zero nibble VPU work) — the latency bar int4 must
    # approach for the capacity feature to be free.
    def build_int8ctl():
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        q = jax.random.randint(ks[0], (128, D), -127, 127, jnp.int8)
        w8 = jax.random.randint(ks[1], (NT, R, D), -127, 127, jnp.int8)

        def k8(q_ref, w_ref, o_ref, acc):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            acc[...] += jax.lax.dot_general(
                q_ref[...], w_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

            @pl.when(t == pl.num_programs(0) - 1)
            def _s():
                o_ref[...] = acc[...]

        f = pl.pallas_call(
            k8, grid=(NT,),
            in_specs=[
                pl.BlockSpec((128, D), lambda t: (0, 0)),
                pl.BlockSpec((1, R, D), lambda t: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((128, R), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((128, R), jnp.int32),
            scratch_shapes=[pltpu.VMEM((128, R), jnp.int32)],
        )
        return jax.jit(lambda q, w: f(q, w)), q, w8

    try:
        fj, q, w8 = build_int8ctl()
        fj(q, w8)
        t = measure(fj, q, w8, iters=30, warmup=3, trains=3)
        print(f"int8-payload ctl: {t*1e6:8.1f} us/call", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"int8 ctl FAILED: {type(e).__name__} {str(e)[:100]}")

    for kind in ("int32", "int16", "int8", "split"):
        try:
            fj, q, byte = build(kind)
            o = fj(q, byte)
            _ = np.asarray(o)[0, 0]  # readback: survive-compile proof
            t = measure(fj, q, byte, iters=30, warmup=3, trains=3)
            extra = ""
            if base is None and kind == "int32":
                base = t
            elif base:
                extra = f"  ({base/t:4.2f}x vs int32)"
            print(f"{kind:6s}: {t*1e6:8.1f} us/call{extra}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{kind:6s}: FAILED {type(e).__name__} {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
