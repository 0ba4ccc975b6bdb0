"""Minimal numpy ONNX runtime for load-and-run verification of emitted
models (onnxruntime is not installable here; external consumers use the
same bytes with a real runtime).

Implements exactly the op subset onnx_synth.py emits, with ONNX semantics
(Conv/ConvTranspose NCW, Pad's [begins..., ends...] layout, Reshape's 0/-1
rules, GatherElements, Einsum, CumSum). Nodes execute in graph order —
the builder emits topologically.
"""

from __future__ import annotations

import numpy as np

from .onnx_proto import _DT_TO_NP, parse_model


def _conv1d(x, w, b, pads, stride, dilation, group):
    bsz, cin, t = x.shape
    co, cig, k = w.shape
    x = np.pad(x, ((0, 0), (0, 0), (int(pads[0]), int(pads[1]))))
    span = (k - 1) * dilation + 1
    t_out = (x.shape[2] - span) // stride + 1
    out = np.zeros((bsz, co, t_out), np.float32)
    co_g = co // group
    for g in range(group):
        xg = x[:, g * cig : (g + 1) * cig]
        wg = w[g * co_g : (g + 1) * co_g]
        # im2col: [B, Ci, k, T_out]
        cols = np.stack(
            [xg[:, :, j * dilation : j * dilation + t_out * stride : stride]
             for j in range(k)], axis=2,
        )
        out[:, g * co_g : (g + 1) * co_g] = np.einsum(
            "bckt,ock->bot", cols, wg, optimize=True
        )
    if b is not None:
        out += b[None, :, None]
    return out.astype(np.float32)


def _conv_transpose1d(x, w, b, pads, stride):
    bsz, cin, t = x.shape
    cin2, co, k = w.shape
    assert cin == cin2
    t_full = (t - 1) * stride + k
    out = np.zeros((bsz, co, t_full), np.float32)
    # scatter each input sample's contribution
    contrib = np.einsum("bct,cok->botk", x, w, optimize=True)  # [B, Co, T, k]
    for j in range(k):
        out[:, :, j : j + t * stride : stride] += contrib[:, :, :, j]
    lo, hi = int(pads[0]), int(pads[1])
    out = out[:, :, lo : t_full - hi]
    if b is not None:
        out = out + b[None, :, None]
    return out.astype(np.float32)


def _reshape(x, shape):
    shape = [int(s) for s in shape]
    out = []
    for i, s in enumerate(shape):
        out.append(x.shape[i] if s == 0 else s)
    return x.reshape(out)


def _pad(x, pads, value):
    n = x.ndim
    widths = [(int(pads[i]), int(pads[n + i])) for i in range(n)]
    return np.pad(x, widths, constant_values=value)


def _slice(x, starts, ends, axes, steps=None):
    steps = steps if steps is not None else [1] * len(starts)
    sl = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        a = int(a) % x.ndim
        sl[a] = slice(int(s), None if int(e) >= np.iinfo(np.int32).max else int(e), int(st))
    return x[tuple(sl)]


def run_model(model_bytes: bytes, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    m = parse_model(model_bytes)
    g = m.graph
    env: dict[str, np.ndarray] = dict(g.initializers)
    for name, elem, dims in g.inputs:
        if name not in feeds:
            raise KeyError(f"missing input {name}")
        arr = np.asarray(feeds[name], _DT_TO_NP.get(elem, np.float32))
        env[name] = arr
    for node in g.nodes:
        i = [env[x] if x else None for x in node.inputs]
        a = node.attrs
        op = node.op_type
        if op == "Conv":
            r = _conv1d(i[0], i[1], i[2] if len(i) > 2 else None,
                        a.get("pads", [0, 0]), a.get("strides", [1])[0],
                        a.get("dilations", [1])[0], a.get("group", 1))
        elif op == "ConvTranspose":
            r = _conv_transpose1d(i[0], i[1], i[2] if len(i) > 2 else None,
                                  a.get("pads", [0, 0]), a.get("strides", [1])[0])
        elif op == "MatMul":
            r = (i[0].astype(np.float32) @ i[1].astype(np.float32))
        elif op == "Gemm":
            r = i[0] @ (i[1].T if a.get("transB") else i[1])
            if len(i) > 2:
                r = r + i[2]
        elif op == "Add":
            r = i[0] + i[1]
        elif op == "Sub":
            r = i[0] - i[1]
        elif op == "Mul":
            r = i[0] * i[1]
        elif op == "Div":
            r = i[0] / i[1]
        elif op == "Pow":
            r = i[0] ** i[1]
        elif op == "Sqrt":
            r = np.sqrt(i[0])
        elif op == "Exp":
            r = np.exp(i[0])
        elif op == "Log":
            r = np.log(i[0])
        elif op == "Neg":
            r = -i[0]
        elif op == "Abs":
            r = np.abs(i[0])
        elif op == "Floor":
            r = np.floor(i[0])
        elif op == "Round":
            r = np.rint(i[0])
        elif op == "Tanh":
            r = np.tanh(i[0])
        elif op == "Sigmoid":
            r = 1.0 / (1.0 + np.exp(-i[0]))
        elif op == "Relu":
            r = np.maximum(i[0], 0)
        elif op == "Softplus":
            r = np.logaddexp(0.0, i[0]).astype(np.float32)
        elif op == "LeakyRelu":
            alpha = a.get("alpha", 0.01)
            r = np.where(i[0] >= 0, i[0], alpha * i[0]).astype(np.float32)
        elif op == "Sin":
            r = np.sin(i[0])
        elif op == "Cos":
            r = np.cos(i[0])
        elif op == "Softmax":
            ax = a.get("axis", -1)
            e = np.exp(i[0] - i[0].max(axis=ax, keepdims=True))
            r = e / e.sum(axis=ax, keepdims=True)
        elif op == "Transpose":
            r = np.transpose(i[0], a["perm"])
        elif op == "Reshape":
            r = _reshape(i[0], i[1])
        elif op == "Concat":
            r = np.concatenate(i, axis=a["axis"])
        elif op == "Split":
            sizes = i[1] if len(i) > 1 else None
            idx = np.cumsum(sizes)[:-1].astype(int)
            parts = np.split(i[0], idx, axis=a["axis"])
            for out_name, part in zip(node.outputs, parts):
                env[out_name] = part
            continue
        elif op == "Slice":
            r = _slice(i[0], i[1], i[2], i[3], i[4] if len(i) > 4 else None)
        elif op == "Pad":
            r = _pad(i[0], i[1], i[2] if len(i) > 2 else 0.0)
        elif op == "Unsqueeze":
            r = i[0]
            for ax in sorted(int(x) for x in i[1]):
                r = np.expand_dims(r, ax)
        elif op == "Squeeze":
            r = np.squeeze(i[0], axis=tuple(int(x) for x in i[1]))
        elif op == "Cast":
            r = i[0].astype(_DT_TO_NP[a["to"]])
        elif op == "Gather":
            r = np.take(i[0], i[1].astype(np.int64), axis=a.get("axis", 0))
        elif op == "GatherElements":
            ax = a.get("axis", 0)
            r = np.take_along_axis(i[0], i[1].astype(np.int64), axis=ax)
        elif op == "Shape":
            r = np.asarray(i[0].shape, np.int64)
        elif op == "Range":
            r = np.arange(int(i[0]), int(i[1]), int(i[2]), dtype=np.int64)
        elif op == "Einsum":
            r = np.einsum(a["equation"], *[x.astype(np.float32) for x in i], optimize=True)
        elif op == "CumSum":
            r = np.cumsum(i[0], axis=int(np.asarray(i[1]).reshape(-1)[0]))
        elif op == "ReduceMean":
            axes = a.get("axes")
            if axes is None and len(i) > 1 and i[1] is not None:
                axes = [int(x) for x in i[1]]
            r = i[0].mean(axis=tuple(axes), keepdims=bool(a.get("keepdims", 1)))
        elif op == "ReduceSum":
            axes = [int(x) for x in i[1]] if len(i) > 1 and i[1] is not None else a.get("axes")
            r = i[0].sum(axis=tuple(axes), keepdims=bool(a.get("keepdims", 1)))
        elif op == "Where":
            r = np.where(i[0], i[1], i[2])
        elif op == "Greater":
            r = i[0] > i[1]
        elif op == "Less":
            r = i[0] < i[1]
        elif op == "Equal":
            r = i[0] == i[1]
        elif op == "Not":
            r = ~i[0]
        elif op == "Min":
            r = np.minimum(i[0], i[1])
        elif op == "Max":
            r = np.maximum(i[0], i[1])
        elif op == "Clip":
            lo = i[1] if len(i) > 1 and i[1] is not None else None
            hi = i[2] if len(i) > 2 and i[2] is not None else None
            r = np.clip(i[0], lo, hi)
        elif op == "Expand":
            r = np.broadcast_to(i[0], np.broadcast_shapes(i[0].shape, tuple(int(s) for s in i[1]))).copy()
        elif op == "Identity":
            r = i[0]
        else:
            raise NotImplementedError(f"op {op}")
        env[node.outputs[0]] = (
            r.astype(np.float32)
            if isinstance(r, np.ndarray) and r.dtype == np.float64
            else r
        )
    return {name: env[name] for name, _e, _d in g.outputs}
