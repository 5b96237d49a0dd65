"""CEnc complex-free boundary codec (core/runtime)."""

import numpy as np

import jax
import jax.numpy as jnp

from csdr_tpu.core.runtime import (
    CEnc, encode_tree, decode_tree, decode_tree_host, _encode_host,
    to_host, to_device,
)


def test_encode_decode_roundtrip_in_jit():
    tree = {
        "c": jnp.ones((7,), jnp.complex64) * (1 + 2j),
        "f": jnp.arange(5, dtype=jnp.float32),
        "nested": (jnp.zeros((2, 3), jnp.complex64), jnp.ones((1,), jnp.int32)),
    }
    out = jax.jit(lambda t: decode_tree(encode_tree(t)))(tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert a.dtype == b.dtype


def test_encoded_tree_has_no_complex_leaves():
    tree = (jnp.ones((4,), jnp.complex64), jnp.ones((4,), jnp.float32))
    enc = jax.jit(lambda t: encode_tree(t))(tree)
    for leaf in jax.tree.leaves(enc):
        assert not jnp.iscomplexobj(leaf)


def test_decode_tree_host():
    enc = encode_tree(jnp.asarray(np.arange(6).astype(np.complex64) * (1 - 1j)))
    dec = decode_tree_host(enc)
    assert dec.dtype == np.complex64
    assert np.allclose(dec, np.arange(6) * (1 - 1j))


def test_encode_host_numpy_complex():
    x = (np.arange(8) + 1j * np.arange(8)).astype(np.complex64)
    e = _encode_host(x)
    assert isinstance(e, CEnc)
    back = decode_tree_host(e)
    assert np.array_equal(back, x)


def test_encode_host_real_passthrough():
    x = np.ones(8, np.float32)
    e = _encode_host(x)
    assert not isinstance(e, CEnc)


def test_to_device_to_host_roundtrip():
    x = (np.random.default_rng(0).normal(size=100)
         + 1j * np.random.default_rng(1).normal(size=100)).astype(np.complex64)
    d = to_device(x)
    assert jnp.iscomplexobj(d)
    back = to_host(d)
    assert np.allclose(back, x, atol=1e-7)
