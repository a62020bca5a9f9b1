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


def test_rails_fft_bit_identical_to_pairs_fft():
    """fft_rails / fft_ri (the r5 rail-major device path) must be
    BIT-identical to fft_pairs — same arithmetic, only the stacking
    moved — and rails_to_np/rails_from_np must round-trip."""
    from dtv_utils_tpu.ops.cfft import fft_pairs, fft_rails, fft_ri
    for n in (256, 2048):
        c = (RNG.normal(size=(3, n))
             + 1j * RNG.normal(size=(3, n))).astype(np.complex64)
        pairs = jnp.asarray(cplx.from_np(c))            # [3, n, 2]
        rails = jnp.asarray(cplx.rails_from_np(c, axis=1))   # [3, 2, n]
        for sign in (-1, +1):
            a = np.asarray(fft_pairs(pairs, sign))
            b = np.asarray(fft_rails(rails, sign))
            np.testing.assert_array_equal(np.moveaxis(a, -1, -2), b)
            br, bi = fft_ri(rails[:, 0, :], rails[:, 1, :], sign)
            np.testing.assert_array_equal(b[:, 0, :], np.asarray(br))
            np.testing.assert_array_equal(b[:, 1, :], np.asarray(bi))
    # host-boundary converters round-trip
    np.testing.assert_array_equal(
        cplx.rails_to_np(cplx.rails_from_np(c, axis=1), axis=1), c)
