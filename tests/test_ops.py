"""Unit tests for the ops layer: masks, STFT/iSTFT and convs are checked
against torch (CPU) as the golden reference — the reference repo's numerics
are torch, so torch parity here is parity with the reference's L0."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from moss_speech_decoder_cosy_tpu.ops import masks, stft as stft_ops
from moss_speech_decoder_cosy_tpu.ops.convs import (
    Conv1d, CausalConv1d, ConvTranspose1d)


def test_subsequent_chunk_mask_matches_reference_semantics():
    size, chunk = 10, 3
    got = np.asarray(masks.subsequent_chunk_mask(size, chunk, -1))
    want = np.zeros((size, size), bool)
    for i in range(size):
        want[i, : min((i // chunk + 1) * chunk, size)] = True
    np.testing.assert_array_equal(got, want)

    got = np.asarray(masks.subsequent_chunk_mask(size, chunk, 1))
    want = np.zeros((size, size), bool)
    for i in range(size):
        start = max((i // chunk - 1) * chunk, 0)
        want[i, start: min((i // chunk + 1) * chunk, size)] = True
    np.testing.assert_array_equal(got, want)


def test_valid_mask():
    got = np.asarray(masks.valid_mask(jnp.array([2, 4]), 5))
    np.testing.assert_array_equal(
        got, [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]])


@pytest.mark.parametrize("n_fft,hop,length", [(16, 4, 480), (400, 160, 3200)])
def test_stft_matches_torch(n_fft, hop, length):
    rng = np.random.RandomState(0)
    x = rng.randn(2, length).astype(np.float32)
    win = stft_ops.hann_window(n_fft)
    real, imag = stft_ops.stft(jnp.asarray(x), n_fft, hop, win)
    spec = torch.stft(torch.from_numpy(x), n_fft, hop, n_fft,
                      window=torch.from_numpy(win), return_complex=True)
    want = torch.view_as_real(spec).numpy()          # (B, F, T, 2)
    np.testing.assert_allclose(np.asarray(real).transpose(0, 2, 1),
                               want[..., 0], atol=2e-4)
    np.testing.assert_allclose(np.asarray(imag).transpose(0, 2, 1),
                               want[..., 1], atol=2e-4)


def test_istft_matches_torch():
    n_fft, hop, t = 16, 4, 121
    rng = np.random.RandomState(1)
    f = n_fft // 2 + 1
    real = rng.randn(2, t, f).astype(np.float32)
    imag = rng.randn(2, t, f).astype(np.float32)
    win = stft_ops.hann_window(n_fft)
    got = np.asarray(stft_ops.istft(jnp.asarray(real), jnp.asarray(imag),
                                    n_fft, hop, win))
    spec = torch.complex(torch.from_numpy(real.transpose(0, 2, 1)),
                         torch.from_numpy(imag.transpose(0, 2, 1)))
    want = torch.istft(spec, n_fft, hop, n_fft,
                       window=torch.from_numpy(win)).numpy()
    assert got.shape == want.shape == (2, (t - 1) * hop)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_stft_istft_roundtrip():
    n_fft, hop = 16, 4
    rng = np.random.RandomState(2)
    x = rng.randn(1, 480).astype(np.float32)
    win = stft_ops.hann_window(n_fft)
    real, imag = stft_ops.stft(jnp.asarray(x), n_fft, hop, win)
    y = np.asarray(stft_ops.istft(real, imag, n_fft, hop, win))
    np.testing.assert_allclose(y, x, atol=1e-4)


@pytest.mark.parametrize("k,s,p,d,groups", [
    (3, 1, 1, 1, 1), (7, 1, 3, 1, 1), (3, 2, 1, 1, 1),
    (3, 1, 3, 3, 1), (15, 1, 7, 1, 8),
])
def test_conv1d_matches_torch(k, s, p, d, groups):
    rng = np.random.RandomState(3)
    b, t, cin, cout = 2, 20, 8, 16
    x = rng.randn(b, t, cin).astype(np.float32)
    m = Conv1d(cout, k, stride=s, padding=p, dilation=d, groups=groups)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))

    tc = torch.nn.Conv1d(cin, cout, k, s, padding=p, dilation=d,
                         groups=groups)
    w = np.asarray(params["params"]["kernel"])       # (K, I, O)
    tc.weight.data = torch.from_numpy(w.transpose(2, 1, 0).copy())
    tc.bias.data = torch.from_numpy(np.asarray(params["params"]["bias"]))
    want = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 1), atol=1e-5)


@pytest.mark.parametrize("k,s,p", [(16, 8, 4), (11, 5, 3), (7, 3, 2), (4, 2, 1)])
def test_conv_transpose_matches_torch(k, s, p):
    rng = np.random.RandomState(4)
    b, t, cin, cout = 2, 12, 6, 10
    x = rng.randn(b, t, cin).astype(np.float32)
    m = ConvTranspose1d(cout, k, s, padding=p)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))

    tc = torch.nn.ConvTranspose1d(cin, cout, k, s, padding=p)
    w = np.asarray(params["params"]["kernel"])       # (K, I, O)
    tc.weight.data = torch.from_numpy(w.transpose(1, 2, 0).copy())
    tc.bias.data = torch.from_numpy(np.asarray(params["params"]["bias"]))
    want = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    assert got.shape[1] == (t - 1) * s - 2 * p + k
    np.testing.assert_allclose(got, want.transpose(0, 2, 1), atol=1e-5)


def test_weight_norm_matches_torch():
    rng = np.random.RandomState(5)
    b, t, cin, cout, k = 1, 16, 4, 8, 3
    x = rng.randn(b, t, cin).astype(np.float32)
    m = Conv1d(cout, k, padding=1, weight_norm=True)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))

    tc = torch.nn.utils.weight_norm(torch.nn.Conv1d(cin, cout, k, padding=1))
    v = np.asarray(params["params"]["v"])            # (K, I, O)
    g = np.asarray(params["params"]["g"])            # (O,)
    tc.weight_v.data = torch.from_numpy(v.transpose(2, 1, 0).copy())
    tc.weight_g.data = torch.from_numpy(g.reshape(-1, 1, 1).copy())
    tc.bias.data = torch.from_numpy(np.asarray(params["params"]["bias"]))
    want = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 1), atol=1e-5)


def test_causal_conv_streaming_equals_offline():
    rng = np.random.RandomState(6)
    b, t, c, k, d = 1, 24, 4, 3, 2
    x = rng.randn(b, t, c).astype(np.float32)
    m = CausalConv1d(c, k, dilation=d)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full = np.asarray(m.apply(params, jnp.asarray(x)))

    cache = jnp.zeros((b, (k - 1) * d, c))
    outs = []
    for i in range(0, t, 6):
        y, cache = m.apply(params, jnp.asarray(x[:, i:i + 6]), cache)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full, atol=1e-6)


@pytest.mark.parametrize("k,d,chunk", [(3, 1, 4), (5, 2, 8), (7, 1, 5),
                                       (2, 1, 3), (9, 3, 16)])
def test_causal_conv_streaming_grid(k, d, chunk):
    """Stream==offline over a kernel/dilation/chunk grid — the reference's
    streaming-module test discipline (streaming_module_example.py:306-363,
    delta <= 1e-6)."""
    rng = np.random.RandomState(k * 10 + d)
    b, t, c = 1, 48, 6
    x = rng.randn(b, t, c).astype(np.float32)
    m = CausalConv1d(c, k, dilation=d)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full = np.asarray(m.apply(params, jnp.asarray(x)))
    cache = jnp.zeros((b, (k - 1) * d, c))
    outs = []
    for i in range(0, t, chunk):
        y, cache = m.apply(params, jnp.asarray(x[:, i:i + chunk]), cache)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                               atol=1e-6)


def test_conv2d_matches_torch():
    from moss_speech_decoder_cosy_tpu.ops.convs import Conv2d
    rng = np.random.RandomState(7)
    b, hh, ww, cin, cout = 2, 12, 10, 3, 6
    x = rng.randn(b, hh, ww, cin).astype(np.float32)
    m = Conv2d(cout, (3, 9), (1, 2), (1, 4), weight_norm=True)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))

    tc = torch.nn.utils.weight_norm(
        torch.nn.Conv2d(cin, cout, (3, 9), (1, 2), padding=(1, 4)))
    v = np.asarray(params["params"]["v"])            # (KH, KW, I, O)
    g = np.asarray(params["params"]["g"])            # (O,)
    tc.weight_v.data = torch.from_numpy(v.transpose(3, 2, 0, 1).copy())
    tc.weight_g.data = torch.from_numpy(g.reshape(-1, 1, 1, 1).copy())
    tc.bias.data = torch.from_numpy(np.asarray(params["params"]["bias"]))
    want = tc(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-5)
