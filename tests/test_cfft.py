"""Matmul four-step DFT vs numpy.fft (float64 reference)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dtv_utils_tpu.core import cplx
from dtv_utils_tpu.ops.cfft import fft_pairs, ifft_pairs, ifftshift_pairs

RNG = np.random.default_rng(0xFF7)


@pytest.mark.parametrize("n", [2, 8, 256, 1024, 2048, 8192, 32768])
def test_fft_matches_numpy(n):
    x = (RNG.normal(size=(3, n)) + 1j * RNG.normal(size=(3, n)))
    want = np.fft.fft(x, axis=-1)
    got = cplx.to_np(fft_pairs(jnp.asarray(cplx.from_np(x))))
    scale = np.sqrt(n)  # error grows ~sqrt(n) in the worst case
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)


@pytest.mark.parametrize("n", [1024, 8192, 32768])
def test_ifft_matches_numpy(n):
    x = (RNG.normal(size=(2, n)) + 1j * RNG.normal(size=(2, n)))
    want = np.fft.ifft(x, axis=-1) * n          # unnormalized reverse
    got = cplx.to_np(ifft_pairs(jnp.asarray(cplx.from_np(x))))
    np.testing.assert_allclose(got, want, atol=2e-5 * np.sqrt(n), rtol=0)


def test_ifftshift():
    x = (RNG.normal(size=(5, 2048))
         + 1j * RNG.normal(size=(5, 2048))).astype(np.complex64)
    want = np.fft.ifftshift(x, axes=-1)
    got = cplx.to_np(ifftshift_pairs(jnp.asarray(cplx.from_np(x))))
    np.testing.assert_array_equal(got, want)


def test_pair_view_roundtrip():
    c = (RNG.normal(size=17) + 1j * RNG.normal(size=17)).astype(np.complex64)
    assert cplx.to_np(cplx.from_np(c)).dtype == np.complex64
    np.testing.assert_array_equal(cplx.to_np(cplx.from_np(c)), c)
    # pair layout is bit-identical to the gr_complex interleaved-f32 format
    np.testing.assert_array_equal(cplx.from_np(c).reshape(-1),
                                  c.view(np.float32))
