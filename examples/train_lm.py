"""Example: train the flagship GQA transformer on synthetic data.

Single chip:   python examples/train_lm.py
Virtual mesh:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
               python examples/train_lm.py --mesh 2,2,2
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import optax

from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
    init_params,
    make_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--mesh", type=str, default="")
    ap.add_argument("--d-model", type=int, default=512)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()

    cfg = TransformerConfig(
        vocab_size=8192,
        d_model=args.d_model,
        num_layers=args.layers,
        num_heads=8,
        num_kv_heads=4,
        head_dim=64,
        d_ff=args.d_model * 3,
        max_seq=args.seq,
        dtype=jnp.bfloat16,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adamw(3e-4)

    if args.mesh:
        from metal_flash_attention_plus_tpu.parallel.mesh import make_mesh
        from metal_flash_attention_plus_tpu.parallel.spmd import (
            ShardingConfig,
            make_spmd_train_step,
            shard_params,
        )

        dp, tp, cp = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(dp, tp, cp)
        sc = ShardingConfig(attn_mode="ring" if cp > 1 else "local")
        params = shard_params(params, mesh, cfg, sc)
        step = make_spmd_train_step(cfg, mesh, opt, sc)
        print(f"mesh: data={dp} model={tp} context={cp}")
    else:
        step = make_train_step(cfg, opt)

    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    # Synthetic structured data: next token = (token * 31 + 7) % vocab with
    # noise — learnable, so the loss curve means something.
    toks = jax.random.randint(key, (args.batch, args.seq + 1), 0, cfg.vocab_size)
    toks = toks.at[:, 1:].set((toks[:, :-1] * 31 + 7) % cfg.vocab_size)

    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, toks)
        if i % 10 == 0 or i == args.steps - 1:
            loss_v = float(jax.block_until_ready(loss))
            dt = time.perf_counter() - t0
            tok_s = (i + 1) * args.batch * args.seq / dt
            print(f"step {i:4d}  loss {loss_v:8.4f}  {tok_s:,.0f} tok/s")
    print("done")


if __name__ == "__main__":
    main()
