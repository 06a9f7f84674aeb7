"""Checkpoint/resume round-trips and the debug/observability helpers."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from metal_flash_attention_plus_tpu.models.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from metal_flash_attention_plus_tpu.models.transformer import (
    TransformerConfig,
    init_params,
    loss_fn,
    make_train_step,
)
from metal_flash_attention_plus_tpu.ops.flash_attention import BlockSizes
from metal_flash_attention_plus_tpu.utils.debug import dump_lowered, log

CFG = TransformerConfig(
    vocab_size=64, d_model=32, num_layers=1, num_heads=2, num_kv_heads=1,
    head_dim=16, d_ff=64, max_seq=64, dtype=jnp.float32,
    block_sizes=BlockSizes(
        block_q=128, block_kv=128, block_q_dkv=128, block_kv_dkv=128,
        block_q_dq=128, block_kv_dq=128,
    ),
)


@pytest.mark.slow
def test_checkpoint_resume_bitexact(tmp_path):
    params = init_params(CFG, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(CFG, opt)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 33), 0, 64)

    # Train 3 steps, checkpoint, train 2 more.
    for _ in range(3):
        params, opt_state, _ = step(params, opt_state, tokens)
    save_checkpoint(str(tmp_path / "ckpt"), dict(params=params, opt=opt_state))
    for _ in range(2):
        params, opt_state, _ = step(params, opt_state, tokens)
    final_a = float(loss_fn(params, tokens, CFG))

    # Resume from the checkpoint and repeat the last 2 steps.
    restored = load_checkpoint(
        str(tmp_path / "ckpt"),
        template=dict(params=init_params(CFG, jax.random.PRNGKey(0)),
                      opt=opt.init(init_params(CFG, jax.random.PRNGKey(0)))),
    )
    p2, o2 = restored["params"], restored["opt"]
    for _ in range(2):
        p2, o2, _ = step(p2, o2, tokens)
    final_b = float(loss_fn(p2, tokens, CFG))
    np.testing.assert_allclose(final_a, final_b, rtol=1e-6)


def test_dump_lowered(tmp_path):
    f = lambda x: x * 2.0 + 1.0
    path = dump_lowered(
        f, jnp.ones((4, 4)), name="test_dump", path=str(tmp_path)
    )
    text = open(path).read()
    assert "stablehlo" in text or "module" in text


def test_log_gated(capsys, monkeypatch):
    monkeypatch.delenv("MFA_DEBUG", raising=False)
    log("hidden")
    assert capsys.readouterr().out == ""
    monkeypatch.setenv("MFA_DEBUG", "1")
    log("visible")
    assert "visible" in capsys.readouterr().out
