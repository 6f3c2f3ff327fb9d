"""Streaming == offline equivalence for causal convs, mirroring the
reference's own property test (moshi/moshi/modules/conv.py:365-418)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.modules.conv import StreamingConv1d, StreamingConvTranspose1d


KS = [(1, 1), (3, 1), (4, 2), (8, 4), (16, 8), (7, 1), (12, 5), (3, 3)]


@pytest.mark.parametrize("kernel,stride", KS)
@pytest.mark.parametrize("pad_mode", ["constant", "replicate"])
def test_conv_streaming_matches_offline(kernel, stride, pad_mode):
    chin, chout, B = 3, 5, 2
    conv = StreamingConv1d(chin, chout, kernel, stride=stride, pad_mode=pad_mode)
    params = conv.init_params(jax.random.PRNGKey(0))
    frames = 24
    x = jax.random.normal(jax.random.PRNGKey(1), (B, frames * stride, chin))
    y_ref = conv.apply(params, x)
    assert y_ref.shape == (B, frames, chout)

    for chunk_frames in [1, 2, 8]:
        state = conv.init_state(B)
        ys = []
        cl = chunk_frames * stride
        for off in range(0, x.shape[1], cl):
            y, state = conv.step(params, state, x[:, off:off + cl])
            ys.append(y)
        y_stream = jnp.concatenate(ys, axis=1)
        np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel,stride", KS)
def test_convtr_streaming_matches_offline(kernel, stride):
    chin, chout, B = 5, 3, 2
    convtr = StreamingConvTranspose1d(chin, chout, kernel, stride=stride)
    params = convtr.init_params(jax.random.PRNGKey(0))
    frames = 24
    x = jax.random.normal(jax.random.PRNGKey(1), (B, frames, chin))
    y_ref = convtr.apply(params, x)
    assert y_ref.shape == (B, frames * stride, chout)

    for chunk in [1, 2, 8]:
        state = convtr.init_state(B)
        ys = []
        for off in range(0, frames, chunk):
            y, state = convtr.step(params, state, x[:, off:off + chunk])
            ys.append(y)
        y_stream = jnp.concatenate(ys, axis=1)
        np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


def test_conv_dilation_streaming():
    conv = StreamingConv1d(4, 4, 3, stride=1, dilation=4)
    params = conv.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 4))
    y_ref = conv.apply(params, x)
    state = conv.init_state(1)
    ys = []
    for off in range(0, 32, 4):
        y, state = conv.step(params, state, x[:, off:off + 4])
        ys.append(y)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(ys, 1)), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_exec_mask_freezes_state():
    """Frozen slots must not advance their streaming state (streaming.py:183-211)."""
    conv = StreamingConv1d(2, 3, 4, stride=2)
    params = conv.init_params(jax.random.PRNGKey(0))
    B = 2
    x1 = jax.random.normal(jax.random.PRNGKey(1), (B, 4, 2))
    x2 = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 2))

    # Slot 0 executes both chunks; slot 1 is frozen during chunk x_noise.
    state = conv.init_state(B)
    y1, state = conv.step(params, state, x1)
    noise = jax.random.normal(jax.random.PRNGKey(3), (B, 4, 2))
    _, state = conv.step(params, state, noise, exec_mask=jnp.array([True, False]))
    y2, state = conv.step(params, state, x2)

    # Reference run for slot 1 without the frozen chunk.
    state_r = conv.init_state(1)
    y1r, state_r = conv.step(params, state_r, x1[1:])
    y2r, state_r = conv.step(params, state_r, x2[1:])
    np.testing.assert_allclose(np.asarray(y2[1:]), np.asarray(y2r), rtol=1e-5, atol=1e-5)


def test_conv_matches_torch():
    torch = pytest.importorskip("torch")
    B, Cin, Cout, K, S, T = 2, 4, 6, 8, 4, 64
    x = np.random.RandomState(0).randn(B, T, Cin).astype(np.float32)
    conv = StreamingConv1d(Cin, Cout, K, stride=S)
    params = conv.init_params(jax.random.PRNGKey(0))
    y = conv.apply(params, jnp.asarray(x))

    tconv = torch.nn.Conv1d(Cin, Cout, K, stride=S)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(params["weight"]), (2, 1, 0)).copy()))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["bias"]).copy()))
        xt = torch.from_numpy(np.transpose(x, (0, 2, 1)).copy())
        xt = torch.nn.functional.pad(xt, (K - S, 0))
        yt = tconv(xt).numpy()
    np.testing.assert_allclose(np.asarray(y), np.transpose(yt, (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


def test_convtr_matches_torch():
    torch = pytest.importorskip("torch")
    B, Cin, Cout, K, S, T = 2, 6, 4, 8, 4, 16
    x = np.random.RandomState(0).randn(B, T, Cin).astype(np.float32)
    convtr = StreamingConvTranspose1d(Cin, Cout, K, stride=S)
    params = convtr.init_params(jax.random.PRNGKey(0))
    y = convtr.apply(params, jnp.asarray(x))

    tconv = torch.nn.ConvTranspose1d(Cin, Cout, K, stride=S)
    with torch.no_grad():
        # our weight [K, Cin, Cout] -> torch [Cin, Cout, K]
        tconv.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(params["weight"]), (1, 2, 0)).copy()))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["bias"]).copy()))
        xt = torch.from_numpy(np.transpose(x, (0, 2, 1)).copy())
        yt = tconv(xt).numpy()[..., : T * S]
    np.testing.assert_allclose(np.asarray(y), np.transpose(yt, (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


def test_grouped_convtr_matches_torch():
    torch = pytest.importorskip("torch")
    B, C, K, S, T = 2, 8, 8, 4, 10
    x = np.random.RandomState(0).randn(B, T, C).astype(np.float32)
    convtr = StreamingConvTranspose1d(C, C, K, stride=S, groups=C, bias=False)
    params = convtr.init_params(jax.random.PRNGKey(0))
    y = convtr.apply(params, jnp.asarray(x))

    tconv = torch.nn.ConvTranspose1d(C, C, K, stride=S, groups=C, bias=False)
    with torch.no_grad():
        # ours [K, Cin/g=1, Cout=C] -> torch [Cin=C, Cout/g=1, K]
        w = np.transpose(np.asarray(params["weight"]), (2, 1, 0)).copy()
        tconv.weight.copy_(torch.from_numpy(w))
        xt = torch.from_numpy(np.transpose(x, (0, 2, 1)).copy())
        yt = tconv(xt).numpy()[..., : T * S]
    np.testing.assert_allclose(np.asarray(y), np.transpose(yt, (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("learnt", [True, False])
def test_upsample_streaming_matches_offline(learnt):
    """Non-learnt ConvTrUpsample1d normalizes by the position-dependent
    convtr-of-ones response; streaming must match offline from the very first
    window (ADVICE r1: early windows used the steady-state norm)."""
    from moshi_tpu.modules.resample import ConvTrUpsample1d

    B, C, S, frames = 2, 4, 3, 12
    up = ConvTrUpsample1d(stride=S, dimension=C, learnt=learnt,
                          channel_wise=learnt)
    params = up.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, frames, C))
    y_ref = up.apply(params, x)
    assert y_ref.shape == (B, frames * S, C)

    for chunk in [1, 4]:
        state = up.init_state(B)
        ys = []
        for off in range(0, frames, chunk):
            y, state = up.step(params, state, x[:, off:off + chunk])
            ys.append(y)
        y_stream = jnp.concatenate(ys, axis=1)
        np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)
