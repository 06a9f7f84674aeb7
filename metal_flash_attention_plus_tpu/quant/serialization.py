"""Versioned QuantizedTensor serialization.

Analog of the reference's full Codable round-trip
(``GEMMQuantization.swift:906-1078``: versioned header, raw buffer bytes,
64-byte-aligned reconstruction, device injected via decoder userInfo).  The
TPU shape of the same idea: one ``.npz`` per tensor holding the integer
payload + parameter arrays, with a JSON header carrying the static config;
loading rebuilds the pytree on the current default device (no userInfo
needed — jnp.asarray places arrays).
"""

from __future__ import annotations

import io
import json
from typing import Union

import jax.numpy as jnp
import numpy as np

from metal_flash_attention_plus_tpu.quant.params import (
    QuantConfig,
    QuantGranularity,
    QuantStrategy,
)
from metal_flash_attention_plus_tpu.quant.tensor import QuantizedTensor

FORMAT_VERSION = 1


def _config_to_dict(c: QuantConfig) -> dict:
    return dict(
        bits=c.bits,
        granularity=c.granularity.value,
        strategy=c.strategy.value,
        block_size=c.block_size,
        block_rows=c.block_rows,
        compute_sums=c.compute_sums,
    )


def _config_from_dict(d: dict) -> QuantConfig:
    return QuantConfig(
        bits=d["bits"],
        granularity=QuantGranularity(d["granularity"]),
        strategy=QuantStrategy(d["strategy"]),
        block_size=d["block_size"],
        block_rows=d["block_rows"],
        compute_sums=d["compute_sums"],
    )


def save_quantized(t: QuantizedTensor, path_or_file: Union[str, io.IOBase]):
    header = dict(
        version=FORMAT_VERSION,
        config=_config_to_dict(t.config),
        shape=list(t.shape),
        orig_dtype=jnp.dtype(t.orig_dtype).name,
        has_sums=t.sums is not None,
    )
    arrays = dict(
        header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        data=np.asarray(t.data),
        scale=np.asarray(t.scale),
        zero_point=np.asarray(t.zero_point),
    )
    if t.sums is not None:
        arrays["sums"] = np.asarray(t.sums)
    np.savez(path_or_file, **arrays)


def load_quantized(path_or_file: Union[str, io.IOBase]) -> QuantizedTensor:
    with np.load(path_or_file) as z:
        header = json.loads(bytes(z["header"]).decode())
        version = header["version"]
        if version > FORMAT_VERSION:
            raise ValueError(
                f"quantized tensor format v{version} is newer than this "
                f"library (v{FORMAT_VERSION})"
            )
        sums = jnp.asarray(z["sums"]) if header["has_sums"] else None
        return QuantizedTensor(
            data=jnp.asarray(z["data"]),
            scale=jnp.asarray(z["scale"]),
            zero_point=jnp.asarray(z["zero_point"]),
            sums=sums,
            config=_config_from_dict(header["config"]),
            shape=tuple(header["shape"]),
            orig_dtype=jnp.dtype(header["orig_dtype"]),
        )
