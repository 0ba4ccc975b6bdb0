"""1-D convolution primitives, channels-last, with weight normalization.

Design notes (TPU-first):
- activations are [B, T, C]; convs run as lax.conv_general_dilated with
  ('NWC', 'WIO', 'NWC') so the channel contraction lands on the MXU,
- weight norm is an explicit (g, v) parameterization computed at call time
  (training-dynamics-faithful to torch weight_norm, used throughout the
  reference: modules/modules.py:90-107, vdecoder/hifigan/models.py:335-358);
  ``fold_weight_norm`` bakes it into plain kernels for inference,
- transposed conv is expressed as an input-dilated conv (XLA lowers both the
  same way; we keep the torch ConvTranspose1d weight-norm axis semantics so
  converted checkpoints train identically).

Group convolutions (used by the scale discriminator, models.py:206-212) are
supported via feature_group_count.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv1d default init: kaiming_uniform(a=sqrt(5)) == uniform with
# bound sqrt(1/fan_in) == variance_scaling(1/3, fan_in, uniform).
torch_conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def _torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _norm_except(v: jax.Array, axis: int) -> jax.Array:
    """L2 norm over all axes except `axis` (torch _weight_norm semantics)."""
    axes = tuple(i for i in range(v.ndim) if i != axis)
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))


def _l2n(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / (jnp.linalg.norm(x) + eps)


def spectral_normalize(module: nn.Module, kernel: jax.Array, perm: tuple) -> jax.Array:
    """torch spectral_norm semantics (models.py:165-252 use_spectral_norm).

    One power iteration on the [out, -1] weight matrix per call when the
    'spectral' collection is mutable (training); eval uses the stored u/v.
    `perm` permutes the kernel into torch's (out, in, k...) order so the
    stored v vector is layout-compatible with converted torch checkpoints.
    """
    w_mat = jnp.transpose(kernel, perm).reshape(kernel.shape[perm[0]], -1)
    out, cols = w_mat.shape
    u_var = module.variable(
        "spectral", "u",
        lambda: _l2n(jax.random.normal(module.make_rng("params"), (out,))),
    )
    v_var = module.variable(
        "spectral", "v",
        lambda: _l2n(jax.random.normal(module.make_rng("params"), (cols,))),
    )
    if module.is_mutable_collection("spectral") and not module.is_initializing():
        v = _l2n(w_mat.T @ u_var.value)
        u = _l2n(w_mat @ v)
        u_var.value, v_var.value = u, v
    else:
        u, v = u_var.value, v_var.value
    sigma = u @ (w_mat @ v)
    return kernel / sigma


class Conv1d(nn.Module):
    """Channels-last conv1d. kernel layout: [kw, in_ch // groups, out_ch].

    padding: integer -> symmetric torch-style padding; or a (lo, hi) tuple.
    weight_norm: torch-compatible (norm over (kw, in) per output channel).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int | tuple[int, int] = 0
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: Callable = torch_conv_kernel_init
    # fold_p > 1 lowers the conv as time-folded MXU matmuls (ops/folded.py)
    # when legal (stride 1, groups 1, symmetric 'same' padding, T % P == 0).
    # Use for small channel counts where XLA's conv starves the MXU.
    fold_p: int = 1
    spectral_norm: bool = False  # torch spectral_norm (power iteration)
    # lower wide grouped convs as im2col + block-batched einsum instead of
    # conv_general_dilated (see the wide-grouped branch below)
    im2col: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        folded: tuple[int, int] | None = None,
        return_kernel: bool = False,
    ) -> jax.Array:
        """folded=(p_in, p_out): x is a folded [B, Q, p_in*Ci] view and a
        folded [B, Q, p_out*Co] view is returned (ops/folded.py); p_in must
        equal p_out*stride. return_kernel skips the conv and returns the
        effective (kernel, bias) — used by the Pallas fused-stage engine to
        reuse this module's params without changing the param tree.
        """
        in_ch = x.shape[-1] if folded is None else x.shape[-1] // folded[0]
        assert in_ch % self.groups == 0 and self.features % self.groups == 0
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        fan_in = self.kernel_size * in_ch // self.groups

        v = self.param("kernel", self.kernel_init, kshape, self.param_dtype)
        if self.weight_norm:
            g = self.param(
                "g",
                lambda key, shape, dtype=self.param_dtype: _norm_except(
                    self.kernel_init(key, kshape, dtype), 2
                ).reshape(shape),
                (self.features,),
                self.param_dtype,
            )
            kernel = v * (g.reshape(1, 1, -1) / _norm_except(v, 2))
        elif self.spectral_norm:
            kernel = spectral_normalize(self, v, (2, 1, 0))
        else:
            kernel = v

        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", _torch_bias_init(fan_in), (self.features,), self.param_dtype
            )
        if return_kernel:
            return kernel.astype(self.dtype), (
                bias.astype(self.dtype) if bias is not None else None
            )

        pad = (
            (self.padding, self.padding)
            if isinstance(self.padding, int)
            else tuple(self.padding)
        )
        if folded is not None:
            from ..ops.folded import folded_conv1d_f

            p_in, p_out = folded
            assert p_in == p_out * self.stride, (folded, self.stride)
            assert pad[0] == pad[1]
            if self.groups > 1:
                # narrow grouped folded conv (the scale discriminator's g4 /
                # g16 towers): expand the grouped kernel to its dense
                # block-diagonal form (exact — off-block zeros) so the fold
                # matrices contract full-width; only legal when the whole
                # input width fits one fold row
                assert in_ch <= 128, (in_ch, self.groups)
                cig = in_ch // self.groups
                cog = self.features // self.groups
                # [k, cig, g, cog] -> [k, g, cig, cog]
                kb = kernel.reshape(
                    self.kernel_size, cig, self.groups, cog
                ).transpose(0, 2, 1, 3)
                eye = jnp.eye(self.groups, dtype=kernel.dtype)
                # dense[j, g*cig + i, h*cog + o] = kb[j, g, i, o] * eye[g, h]
                kd = kb[:, :, :, None, :] * eye[None, :, None, :, None]
                kernel = kd.reshape(self.kernel_size, in_ch, self.features)
            return folded_conv1d_f(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                bias.astype(self.dtype) if bias is not None else None,
                self.dilation,
                p_out,
                stride=self.stride,
                pad=pad[0],
            )
        if (
            self.fold_p > 1
            and self.stride == 1
            and self.groups == 1
            and pad[0] == pad[1] == (self.kernel_size - 1) * self.dilation // 2
        ):
            from ..ops.folded import folded_conv1d

            p = self.fold_p
            while p > 1 and x.shape[1] % p:
                p //= 2
            if p > 1:
                b = bias.astype(self.dtype) if bias is not None else None
                return folded_conv1d(
                    x.astype(self.dtype), kernel.astype(self.dtype), b,
                    self.dilation, p,
                )
        groups = self.groups
        kernel = kernel.astype(self.dtype)
        if 1 < groups < in_ch and in_ch <= 128:
            # Narrow grouped convs (the scale discriminator's early tower,
            # models.py:206-212) starve the MXU: each group's C/groups-wide
            # contraction leaves the 128-lane tiles almost empty (measured
            # 5.3 ms -> 0.05 ms on the 64ch/16-group layer, v5e). Execute
            # as a DENSE conv with the kernel scattered into its
            # block-diagonal form — the off-block zeros contribute exact fp
            # zeros, so results match feature_group_count numerics while
            # the MXU runs full-width contractions. Wide inputs (>128: the
            # whole lane tile is filled anyway) and depthwise convs
            # (groups == in_ch) keep the grouped path — measured faster.
            cig = in_ch // groups
            cog = self.features // groups
            idx = jnp.arange(groups)
            kd = jnp.zeros(
                (self.kernel_size, groups, cig, groups, cog), self.dtype
            )
            kb = kernel.reshape(self.kernel_size, cig, groups, cog)
            kd = kd.at[:, idx, :, idx, :].set(kb.transpose(2, 0, 1, 3))
            kernel = kd.reshape(self.kernel_size, in_ch, self.features)
            groups = 1
        nb = in_ch // 128
        if (
            1 < groups < in_ch  # depthwise stays on the grouped path
            and in_ch > 128
            and in_ch % 128 == 0
            and nb > 1
            and groups % nb == 0
            and self.features % nb == 0
        ):
            # Wide grouped towers (the scale discriminator's g64/g256
            # layers): every fine group lies INSIDE one 128-lane block, so
            # scattering the per-group kernels into dense 128-wide blocks
            # and keeping only nb = in_ch/128 coarse feature groups is
            # exact (off-block zeros) while every contraction is a full
            # 128-wide MXU feed. Measured on v5e (tools/profile_msd_bwd.py,
            # fwd+bwd): g64 2.53 -> 1.73 ms, g256 3.41 -> 1.81 ms vs the
            # r2 custom block-diagonal-dx VJP it replaces; XLA's own VJP of
            # this form is also the fastest backward measured.
            gpb = groups // nb
            cig = in_ch // groups
            cog = self.features // groups
            cib = in_ch // nb
            kb = kernel.reshape(self.kernel_size, cig, nb, gpb, cog)
            # block-diagonal expansion as a broadcast multiply with a
            # constant identity (NOT an .at[].set scatter: the scatter and
            # its transpose blew XLA's compile time up inside the full GAN
            # step graph; the multiply lowers to a select XLA fuses away)
            eye = jnp.eye(gpb, dtype=self.dtype)
            kd = kb[:, None] * eye[None, :, None, None, :, None]
            kernel = kd.reshape(self.kernel_size, cib, self.features)
            groups = nb
            if self.im2col:
                # deep-tower shapes (T <= a few hundred by these layers):
                # XLA's conv halo machinery runs the g64/g256 BACKWARD at
                # ~3% MFU; one explicit im2col + block-batched einsum is a
                # full-width MXU feed instead (ops/im2col.py)
                from ..ops.im2col import conv1d_im2col

                y = conv1d_im2col(
                    x.astype(self.dtype), kernel, None,
                    self.stride, pad[0], self.dilation, nb=nb,
                )
                if bias is not None:
                    y = y + bias.astype(self.dtype)
                return y
        if (
            groups == 1
            and self.stride == 1
            and self.kernel_size > 1
            and pad[0] == pad[1]
            and pad[0] <= (self.kernel_size - 1) * self.dilation
        ):
            # Matmul-backward conv (ops/convvjp.py): forward is the same
            # XLA conv, but the VJP is k shifted MXU matmuls instead of
            # XLA's conv-transpose halo machinery — which the train-step
            # trace showed costing ~1.2 ms/step across the WN/FFN convs.
            from ..ops.convvjp import conv1d_mm_vjp

            y = conv1d_mm_vjp(
                x.astype(self.dtype), kernel, self.dilation, pad[0]
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel,
                window_strides=(self.stride,),
                padding=(pad,),
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=groups,
            )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Channels-last transposed conv1d, as an input-dilated conv.

    Matches torch ConvTranspose1d(kernel, stride, padding): output length
    (T-1)*stride - 2*padding + kernel. Kernel layout [kw, in_ch, out_ch]
    indexed in *transpose* orientation; weight norm normalizes per input
    channel over (kw, out) — exactly torch's dim=0 on its (in, out, kw)
    weight (vdecoder/hifigan/models.py:340-342 uses this for every upsample).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: Callable = torch_conv_kernel_init
    # fold_out > 1 lowers the transposed conv as folded MXU matmuls
    # (ops/folded.py); must be a multiple of stride, used when the output
    # channel count is small.
    fold_out: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, folded: tuple[int, int] | None = None
    ) -> jax.Array:
        """folded=(p_in, p_out): folded [B, Q, p_in*Ci] -> folded
        [B, Q*stride*p_in/p_out, p_out*Co] (ops/folded.py)."""
        in_ch = x.shape[-1] if folded is None else x.shape[-1] // folded[0]
        kshape = (self.kernel_size, in_ch, self.features)
        # torch fan_in for ConvTranspose1d = out_ch * kernel (weight dim 1,2)
        fan_in = self.kernel_size * self.features

        v = self.param("kernel", self.kernel_init, kshape, self.param_dtype)
        if self.weight_norm:
            g = self.param(
                "g_in",  # distinct name: folded over a different axis
                lambda key, shape, dtype=self.param_dtype: _norm_except(
                    self.kernel_init(key, kshape, dtype), 1
                ).reshape(shape),
                (in_ch,),
                self.param_dtype,
            )
            kernel = v * (g.reshape(1, -1, 1) / _norm_except(v, 1))
        else:
            kernel = v

        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", _torch_bias_init(fan_in), (self.features,), self.param_dtype
            )

        if folded is not None:
            from ..ops.folded import folded_conv_transpose1d_f

            p_in, p_out = folded
            return folded_conv_transpose1d_f(
                x.astype(self.dtype), kernel.astype(self.dtype),
                bias.astype(self.dtype) if bias is not None else None,
                self.stride, self.padding, p_in, p_out,
            )

        if self.fold_out > 1 and self.fold_out % self.stride == 0:
            p_in = self.fold_out // self.stride
            if x.shape[1] % max(p_in, 1) == 0:
                from ..ops.folded import folded_conv_transpose1d

                return folded_conv_transpose1d(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    bias.astype(self.dtype) if bias is not None else None,
                    self.stride, self.padding, self.fold_out,
                )

        # conv-transpose(x, V) == conv(dilate(x, stride), flip_t(V)) with
        # padding (k-1-p); V is already [kw, in, out] == WIO after the flip.
        kernel = jnp.flip(kernel, axis=0)
        p = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,),
            padding=((p, p),),
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class SeparableConv1d(nn.Module):
    """Depthwise-separable conv1d (modules/DSConv.py:5-76 equivalent).

    Depthwise conv (groups=C) followed by a pointwise 1x1; both can be
    weight-normalized (the reference's weight_norm_modules norms each part).
    Enabled by the ``use_depthwise_conv`` model flag.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        x = Conv1d(
            features=in_ch,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            padding=self.padding,
            groups=in_ch,
            use_bias=self.use_bias,
            weight_norm=self.weight_norm,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="depth",
        )(x)
        x = Conv1d(
            features=self.features,
            kernel_size=1,
            use_bias=self.use_bias,
            weight_norm=self.weight_norm,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="point",
        )(x)
        return x


def make_conv1d(separable: bool, **kwargs):
    """Conv1dModel switch (modules/modules.py:16-20): plain or separable."""
    if separable and kwargs.get("kernel_size", 1) > 1:
        kwargs.pop("groups", None)
        kwargs.pop("fold_p", None)  # separable path stays on XLA convs
        return SeparableConv1d(**kwargs)
    return Conv1d(**kwargs)


def fold_weight_norm(params):
    """Bake (g, v) weight-norm pairs into plain kernels for inference.

    Mirrors remove_weight_norm (vdecoder/hifigan/models.py:396-403). Works on
    any param pytree: wherever a dict has 'kernel' plus 'g' (Conv1d: norm per
    output channel, axis 2) or 'g_in' (ConvTranspose1d: per input channel,
    axis 1), replace kernel by the normalized product and drop the gain.
    """

    def fold(tree):
        if isinstance(tree, dict):
            if "kernel" in tree and ("g" in tree or "g_in" in tree):
                v = tree["kernel"]
                axis = 2 if "g" in tree else 1
                g = tree.get("g", tree.get("g_in"))
                shape = [1, 1, 1]
                shape[axis] = -1
                kernel = v * (g.reshape(shape) / _norm_except(v, axis))
                out = {
                    k: val
                    for k, val in tree.items()
                    if k not in ("kernel", "g", "g_in")
                }
                out["kernel"] = kernel
                return out
            return {k: fold(v) for k, v in tree.items()}
        return tree

    return fold(params)


class Conv2d(nn.Module):
    """Channels-last (NHWC) conv2d with optional torch-style weight norm.

    Used by the period discriminators (models.py:165-199): kernels (k, 1),
    strides (s, 1). kernel layout: [kh, kw, in_ch, out_ch]; weight norm is
    per output channel over (kh, kw, in) — torch dim=0 on (out, in, kh, kw).
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False  # torch spectral_norm (power iteration)
    # lower (k, 1) convs as im2col + one dense matmul (ops/im2col.py): the
    # period discriminators' deep layers shrink H to ~11-56 where XLA's
    # conv halo machinery runs at ~20% MFU
    im2col: bool = False
    kernel_init: Callable = torch_conv_kernel_init
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kshape = (kh, kw, in_ch, self.features)
        fan_in = kh * kw * in_ch

        v = self.param("kernel", self.kernel_init, kshape, self.param_dtype)
        if self.weight_norm:
            g = self.param(
                "g",
                lambda key, shape, dtype=self.param_dtype: _norm_except(
                    self.kernel_init(key, kshape, dtype), 3
                ).reshape(shape),
                (self.features,),
                self.param_dtype,
            )
            kernel = v * (g.reshape(1, 1, 1, -1) / _norm_except(v, 3))
        elif self.spectral_norm:
            kernel = spectral_normalize(self, v, (3, 2, 0, 1))
        else:
            kernel = v

        ph, pw = self.padding
        if self.im2col and kw == 1 and self.strides[1] == 1 and pw == 0:
            from ..ops.im2col import conv2d_w1_im2col

            y = conv2d_w1_im2col(
                x.astype(self.dtype), kernel.astype(self.dtype), None,
                self.strides[0], ph,
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=self.strides,
                padding=((ph, ph), (pw, pw)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param(
                "bias", _torch_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + b.astype(self.dtype)
        return y
