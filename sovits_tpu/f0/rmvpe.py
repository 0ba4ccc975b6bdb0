"""RMVPE pitch estimation: the vendored RMVPE net ported to flax.

Equivalent of modules/F0Predictor/rmvpe/ (model.py E2E0, deepunet.py,
seq.py BiGRU, spec.py, utils.py decode): HTK-mel(128, fmin 30) front-end ->
residual conv U-Net (5 enc / 4 inter / 5 dec, avg-pool 2x2) -> 3-channel
head -> BiGRU(384->2x256) -> 360-bin salience -> local-average-cents decode.
Weights convert 1:1 from the published rmvpe checkpoint.

The BiGRU is the only sequential op (two lax.scans over T frames); all conv
stages are NHWC convs on the MXU.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dsp.audio import resample
from ..dsp.mel import hann_window, mel_filterbank
from .base import F0Predictor

SAMPLE_RATE = 16000
N_CLASS = 360
N_MELS = 128
MEL_FMIN = 30
MEL_FMAX = SAMPLE_RATE // 2
WINDOW_LENGTH = 1024
CENTS_CONST = 1997.3794084376191


def rmvpe_mel(audio: jax.Array, hop_length: int = 160) -> jax.Array:
    """spec.py MelSpectrogram(center=True, htk) -> [B, T, 128] log-mel."""
    audio = audio.astype(jnp.float32)
    y = jnp.pad(audio, ((0, 0), (WINDOW_LENGTH // 2, WINDOW_LENGTH // 2)), mode="reflect")
    n_frames = 1 + (y.shape[-1] - WINDOW_LENGTH) // hop_length
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(WINDOW_LENGTH)[None, :]
    frames = y[:, idx] * jnp.asarray(hann_window(WINDOW_LENGTH))
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)
    fbank = jnp.asarray(
        mel_filterbank(SAMPLE_RATE, WINDOW_LENGTH, N_MELS, MEL_FMIN, MEL_FMAX, htk=True)
    )
    mel = jnp.matmul(mag, fbank, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


class ConvBlockRes(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, T, M, C]
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = jnp.maximum(y, 0.0)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        y = jnp.maximum(y, 0.0)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return y + x


class ResEncoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 4
    pool: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, dtype=self.dtype, name=f"block_{i}")(x)
        if not self.pool:
            return x
        pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x, pooled


class ResDecoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        # ConvTranspose2d k3 s2 p1 outp1 -> exact 2x (deepunet.py:64-78)
        c = self.out_channels
        kernel = self.param(
            "up_kernel", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (3, 3, x.shape[-1], c),
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(kernel, (0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = jnp.maximum(y, 0.0)
        y = jnp.concatenate([y, skip], axis=-1)
        for i in range(self.n_blocks):
            y = ConvBlockRes(c, dtype=self.dtype, name=f"block_{i}")(y)
        return y


class RmvpeNet(nn.Module):
    """E2E0(4, 1, (2,2)) topology (model.py:43-67)."""

    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16
    gru_hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel [B, T, 128] -> salience [B, T, 360]."""
        x = mel[..., None]  # NHWC with H=T, W=128, C=1
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="in_bn")(x)

        skips = []
        ch = self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(ch, self.n_blocks, dtype=self.dtype, name=f"enc_{i}")(x)
            skips.append(skip)
            ch *= 2
        for i in range(self.inter_layers):
            x = ResEncoderBlock(ch, self.n_blocks, pool=False, dtype=self.dtype, name=f"inter_{i}")(x)
        for i in range(self.en_de_layers):
            ch //= 2
            x = ResDecoderBlock(ch, self.n_blocks, dtype=self.dtype, name=f"dec_{i}")(x, skips[-1 - i])

        x = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="cnn")(x)  # [B,T,128,3]
        b, t = x.shape[0], x.shape[1]
        x = x.transpose(0, 1, 3, 2).reshape(b, t, 3 * N_MELS)
        x = BiGRU(self.gru_hidden, dtype=self.dtype, name="gru")(x)
        x = nn.Dense(N_CLASS, dtype=self.dtype, name="fc")(x)
        return jax.nn.sigmoid(x)


class BiGRU(nn.Module):
    """Single-layer bidirectional GRU with torch gate semantics (seq.py:4-10)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.hidden
        in_dim = x.shape[-1]

        def direction(name):
            w_ih = self.param(f"w_ih_{name}", nn.initializers.uniform(1.0 / h**0.5), (3 * h, in_dim))
            w_hh = self.param(f"w_hh_{name}", nn.initializers.uniform(1.0 / h**0.5), (3 * h, h))
            b_ih = self.param(f"b_ih_{name}", nn.initializers.zeros, (3 * h,))
            b_hh = self.param(f"b_hh_{name}", nn.initializers.zeros, (3 * h,))
            return w_ih, w_hh, b_ih, b_hh

        def run(x_seq, params):
            w_ih, w_hh, b_ih, b_hh = params
            # precompute input projections for all steps (one big matmul)
            xi = jnp.einsum("bti,hi->bth", x_seq, w_ih) + b_ih  # [B, T, 3H]

            def step(hprev, xt):
                gi_r, gi_z, gi_n = jnp.split(xt, 3, axis=-1)
                gh = hprev @ w_hh.T + b_hh
                gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(gi_r + gh_r)
                z = jax.nn.sigmoid(gi_z + gh_z)
                n = jnp.tanh(gi_n + r * gh_n)
                hnew = (1.0 - z) * n + z * hprev
                return hnew, hnew

            h0 = jnp.zeros((x_seq.shape[0], h), x_seq.dtype)
            _, out = jax.lax.scan(step, h0, xi.transpose(1, 0, 2))
            return out.transpose(1, 0, 2)  # [B, T, H]

        fwd = run(x, direction("fwd"))
        bwd = run(x[:, ::-1], direction("bwd"))[:, ::-1]
        return jnp.concatenate([fwd, bwd], axis=-1)


def to_local_average_cents(salience: np.ndarray, thred: float = 0.05) -> np.ndarray:
    """rmvpe/utils.py:64-88, vectorized. salience [T, 360] -> cents [T]."""
    mapping = 20.0 * np.arange(N_CLASS) + CENTS_CONST
    t = salience.shape[0]
    center = salience.argmax(axis=1)
    starts = np.clip(center - 4, 0, N_CLASS - 9)
    idx = starts[:, None] + np.arange(9)[None, :]
    window = salience[np.arange(t)[:, None], idx]
    cents = (window * mapping[idx]).sum(axis=1) / (window.sum(axis=1) + 1e-12)
    cents[salience.max(axis=1) <= thred] = 0.0
    return cents


def convert_rmvpe_state_dict(sd: dict) -> dict:
    """torch rmvpe ckpt['model'] -> RmvpeNet params/batch_stats."""

    def conv(prefix, bias=False):
        out = {"kernel": np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0))}
        if bias:
            out["bias"] = sd[prefix + ".bias"]
        return out

    def bn(prefix):
        return (
            {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
            {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]},
        )

    params: dict = {}
    stats: dict = {}

    def conv_block(dst_p, dst_s, prefix):
        dst_p["conv1"] = conv(prefix + ".conv.0")
        dst_p["bn1"], dst_s["bn1"] = bn(prefix + ".conv.1")
        dst_p["conv2"] = conv(prefix + ".conv.3")
        dst_p["bn2"], dst_s["bn2"] = bn(prefix + ".conv.4")
        if prefix + ".shortcut.weight" in sd:
            dst_p["shortcut"] = conv(prefix + ".shortcut", bias=True)

    p_in, s_in = bn("unet.encoder.bn")
    params["in_bn"], stats["in_bn"] = p_in, s_in
    for i in range(5):
        pe, se = {}, {}
        for j in range(4):
            pb, sb = {}, {}
            conv_block(pb, sb, f"unet.encoder.layers.{i}.conv.{j}")
            pe[f"block_{j}"], se[f"block_{j}"] = pb, sb
        params[f"enc_{i}"], stats[f"enc_{i}"] = pe, se
    for i in range(4):
        pe, se = {}, {}
        for j in range(4):
            pb, sb = {}, {}
            conv_block(pb, sb, f"unet.intermediate.layers.{i}.conv.{j}")
            pe[f"block_{j}"], se[f"block_{j}"] = pb, sb
        params[f"inter_{i}"], stats[f"inter_{i}"] = pe, se
    for i in range(5):
        pre = f"unet.decoder.layers.{i}"
        pd, sd_ = {}, {}
        # ConvTranspose2d weight (in, out, kh, kw) -> (kh, kw, in, out)
        pd["up_kernel"] = np.transpose(sd[pre + ".conv1.0.weight"], (2, 3, 0, 1))
        pd["bn1"], sd_["bn1"] = bn(pre + ".conv1.1")
        for j in range(4):
            pb, sb = {}, {}
            conv_block(pb, sb, pre + f".conv2.{j}")
            pd[f"block_{j}"], sd_[f"block_{j}"] = pb, sb
        params[f"dec_{i}"], stats[f"dec_{i}"] = pd, sd_

    params["cnn"] = conv("cnn", bias=True)
    params["gru"] = {
        "w_ih_fwd": sd["fc.0.gru.weight_ih_l0"],
        "w_hh_fwd": sd["fc.0.gru.weight_hh_l0"],
        "b_ih_fwd": sd["fc.0.gru.bias_ih_l0"],
        "b_hh_fwd": sd["fc.0.gru.bias_hh_l0"],
        "w_ih_bwd": sd["fc.0.gru.weight_ih_l0_reverse"],
        "w_hh_bwd": sd["fc.0.gru.weight_hh_l0_reverse"],
        "b_ih_bwd": sd["fc.0.gru.bias_ih_l0_reverse"],
        "b_hh_bwd": sd["fc.0.gru.bias_hh_l0_reverse"],
    }
    params["fc"] = {
        "kernel": np.transpose(sd["fc.1.weight"], (1, 0)),
        "bias": sd["fc.1.bias"],
    }
    return {"params": params, "batch_stats": stats}


class RmvpeF0Predictor(F0Predictor):
    """RMVPE predictor (RMVPEF0Predictor.py:12-107 contract)."""

    name = "rmvpe"

    def __init__(self, *args, weights: dict | None = None, threshold: float = 0.03, **kwargs):
        super().__init__(*args, **kwargs)
        if weights is None:
            raise FileNotFoundError(
                "RMVPE weights not provided; convert the published rmvpe.pt "
                "with sovits_tpu.f0.rmvpe.convert_rmvpe_state_dict"
            )
        self.threshold = threshold
        self.net = RmvpeNet()
        self.variables = jax.tree.map(jnp.asarray, weights)
        self._fn = jax.jit(lambda v, mel: self.net.apply(v, mel))

    def raw_f0(self, wav: np.ndarray, p_len: int) -> np.ndarray:
        wav16 = resample(np.asarray(wav, np.float32), self.sampling_rate, SAMPLE_RATE)
        mel = rmvpe_mel(jnp.asarray(wav16[None]))
        n_frames = mel.shape[1]
        pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames  # inference.py:29-33
        mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
        salience = np.asarray(self._fn(self.variables, mel))[0, :n_frames]
        cents = to_local_average_cents(salience, self.threshold)
        f0 = np.where(cents > 0, 10.0 * 2.0 ** (cents / 1200.0), 0.0)
        # resample from the 10ms rmvpe grid to hop frames
        t_rm = np.arange(len(f0)) * 160 / SAMPLE_RATE
        t_out = np.arange(p_len) * self.hop_length / self.sampling_rate
        voiced = f0 > 0
        out = np.interp(t_out, t_rm, f0)
        uv_track = np.interp(t_out, t_rm, voiced.astype(np.float64))
        out[uv_track < 0.5] = 0.0
        return out
