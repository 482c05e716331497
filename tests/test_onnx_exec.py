# ONNX graph-executor op tests, validated against torch (an independent
# oracle: the reference's .onnx files are torch.onnx.export outputs, so torch
# op semantics define what those graphs compute).
import numpy as np
import pytest

from sherpa_vietnamese_asr_tpu.models.onnx_exec import run_onnx
from sherpa_vietnamese_asr_tpu.models.onnx_synth import GraphBuilder

torch = pytest.importorskip("torch")


def _run1(op, feeds, inits=None, n_out=1, **attrs):
    b = GraphBuilder()
    ins = [b.input(k) for k in feeds]
    for k, v in (inits or {}).items():
        ins.append(b.init(k, v))
    out = b.node(op, ins, n_out=n_out, **attrs)
    outs = out if isinstance(out, list) else [out]
    for o in outs:
        b.output(o)
    return run_onnx(b.build(), feeds)


def test_conv1d_grouped_dilated(rng):
    x = rng.standard_normal((2, 8, 37)).astype(np.float32)
    w = rng.standard_normal((12, 2, 5)).astype(np.float32)
    bias = rng.standard_normal((12,)).astype(np.float32)
    got = _run1("Conv", {"x": x}, {"w": w, "b": bias},
                strides=(2,), pads=(3, 3), dilations=(2,), group=4)[0]
    ref = torch.nn.functional.conv1d(
        torch.tensor(x), torch.tensor(w), torch.tensor(bias),
        stride=2, padding=3, dilation=2, groups=4).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_conv2d(rng):
    x = rng.standard_normal((1, 3, 17, 19)).astype(np.float32)
    w = rng.standard_normal((6, 3, 3, 3)).astype(np.float32)
    got = _run1("Conv", {"x": x}, {"w": w},
                strides=(2, 1), pads=(1, 0, 1, 0), dilations=(1, 1),
                group=1)[0]
    ref = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), stride=(2, 1),
        padding=(1, 0)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_conv_transpose1d(rng):
    # Conv-TasNet decoder shape: kernel 32, stride 16
    x = rng.standard_normal((2, 4, 11)).astype(np.float32)
    w = rng.standard_normal((4, 1, 32)).astype(np.float32)
    got = _run1("ConvTranspose", {"x": x}, {"w": w}, strides=(16,))[0]
    ref = torch.nn.functional.conv_transpose1d(
        torch.tensor(x), torch.tensor(w), stride=16).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_lstm_bidirectional_matches_torch(rng):
    # ONNX gate order iofc vs torch ifgo: the synth helper reorders.
    t_len, batch, inp, hid = 7, 3, 5, 4
    x = rng.standard_normal((t_len, batch, inp)).astype(np.float32)
    m = torch.nn.LSTM(inp, hid, bidirectional=True)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    def reorder(a):  # torch [i,f,g,o] -> ONNX [i,o,f,c]
        i, f, g, o = np.split(a, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    w = np.stack([reorder(sd["weight_ih_l0"]),
                  reorder(sd["weight_ih_l0_reverse"])])
    r = np.stack([reorder(sd["weight_hh_l0"]),
                  reorder(sd["weight_hh_l0_reverse"])])
    bias = np.stack([
        np.concatenate([reorder(sd["bias_ih_l0"]),
                        reorder(sd["bias_hh_l0"])]),
        np.concatenate([reorder(sd["bias_ih_l0_reverse"]),
                        reorder(sd["bias_hh_l0_reverse"])])])
    got = _run1("LSTM", {"x": x}, {"w": w, "r": r, "b": bias},
                n_out=3, direction="bidirectional", hidden_size=hid)
    ref, (hn, cn) = m(torch.tensor(x))
    # ONNX Y is [T, dirs, B, H]; torch is [T, B, dirs*H]
    y = got[0].transpose(0, 2, 1, 3).reshape(t_len, batch, 2 * hid)
    np.testing.assert_allclose(y, ref.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[1], hn.detach().numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(got[2], cn.detach().numpy(), rtol=1e-5,
                               atol=1e-5)


def test_gru_matches_torch(rng):
    t_len, batch, inp, hid = 6, 2, 4, 5
    x = rng.standard_normal((t_len, batch, inp)).astype(np.float32)
    m = torch.nn.GRU(inp, hid)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    # torch gate order [r,z,n] -> ONNX [z,r,h]
    def reorder(a):
        r, z, n = np.split(a, 3, axis=0)
        return np.concatenate([z, r, n], axis=0)
    w = reorder(sd["weight_ih_l0"])[None]
    r = reorder(sd["weight_hh_l0"])[None]
    bias = np.concatenate([reorder(sd["bias_ih_l0"]),
                           reorder(sd["bias_hh_l0"])])[None]
    got = _run1("GRU", {"x": x}, {"w": w, "r": r, "b": bias}, n_out=2,
                hidden_size=hid, linear_before_reset=1)
    ref, hn = m(torch.tensor(x))
    y = got[0][:, 0]
    np.testing.assert_allclose(y, ref.detach().numpy(), rtol=1e-5, atol=1e-5)


def test_lstm_sequence_lens_matches_torch_packed(rng):
    # ORT sequence_lens semantics == torch packed sequences: Y zero on dead
    # steps, Y_h/Y_c frozen at each lane's last valid frame, reverse
    # direction starting from the lane's true end with the INITIAL state
    # (not zeros).
    t_len, batch, inp, hid = 8, 3, 4, 5
    lens = np.array([8, 5, 3], np.int32)
    x = rng.standard_normal((t_len, batch, inp)).astype(np.float32)
    h0 = rng.standard_normal((2, batch, hid)).astype(np.float32)
    c0 = rng.standard_normal((2, batch, hid)).astype(np.float32)
    m = torch.nn.LSTM(inp, hid, bidirectional=True)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    def reorder(a):  # torch [i,f,g,o] -> ONNX [i,o,f,c]
        i, f, g, o = np.split(a, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    w = np.stack([reorder(sd["weight_ih_l0"]),
                  reorder(sd["weight_ih_l0_reverse"])])
    r = np.stack([reorder(sd["weight_hh_l0"]),
                  reorder(sd["weight_hh_l0_reverse"])])
    bias = np.stack([
        np.concatenate([reorder(sd["bias_ih_l0"]),
                        reorder(sd["bias_hh_l0"])]),
        np.concatenate([reorder(sd["bias_ih_l0_reverse"]),
                        reorder(sd["bias_hh_l0_reverse"])])])
    b = GraphBuilder()
    ins = [b.input("x"), b.init("w", w), b.init("r", r), b.init("b", bias),
           b.input("lens"), b.input("h0"), b.input("c0")]
    outs = b.node("LSTM", ins, n_out=3, direction="bidirectional",
                  hidden_size=hid)
    for o in outs:
        b.output(o)
    got = run_onnx(b.build(), {"x": x, "lens": lens, "h0": h0, "c0": c0})
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lens))
    out, (hn, cn) = m(packed, (torch.tensor(h0), torch.tensor(c0)))
    ref_y, _ = torch.nn.utils.rnn.pad_packed_sequence(out, total_length=t_len)
    y = got[0].transpose(0, 2, 1, 3).reshape(t_len, batch, 2 * hid)
    np.testing.assert_allclose(y, ref_y.detach().numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(got[1], hn.detach().numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(got[2], cn.detach().numpy(), rtol=1e-5,
                               atol=1e-5)


def test_gru_sequence_lens_matches_torch_packed(rng):
    t_len, batch, inp, hid = 7, 3, 4, 5
    lens = np.array([7, 4, 2], np.int32)
    x = rng.standard_normal((t_len, batch, inp)).astype(np.float32)
    h0 = rng.standard_normal((1, batch, hid)).astype(np.float32)
    m = torch.nn.GRU(inp, hid)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    def reorder(a):  # torch [r,z,n] -> ONNX [z,r,h]
        r, z, n = np.split(a, 3, axis=0)
        return np.concatenate([z, r, n], axis=0)

    w = reorder(sd["weight_ih_l0"])[None]
    r = reorder(sd["weight_hh_l0"])[None]
    bias = np.concatenate([reorder(sd["bias_ih_l0"]),
                           reorder(sd["bias_hh_l0"])])[None]
    b = GraphBuilder()
    ins = [b.input("x"), b.init("w", w), b.init("r", r), b.init("b", bias),
           b.input("lens"), b.input("h0")]
    outs = b.node("GRU", ins, n_out=2, hidden_size=hid,
                  linear_before_reset=1)
    for o in outs:
        b.output(o)
    got = run_onnx(b.build(), {"x": x, "lens": lens, "h0": h0})
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lens))
    out, hn = m(packed, torch.tensor(h0))
    ref_y, _ = torch.nn.utils.rnn.pad_packed_sequence(out, total_length=t_len)
    y = got[0][:, 0]
    np.testing.assert_allclose(y, ref_y.detach().numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(got[1], hn.detach().numpy(), rtol=1e-5,
                               atol=1e-5)


def test_pools_match_torch(rng):
    x = rng.standard_normal((2, 3, 15, 13)).astype(np.float32)
    got = _run1("MaxPool", {"x": x}, kernel_shape=(3, 3), strides=(2, 2),
                pads=(1, 1, 1, 1))[0]
    ref = torch.nn.functional.max_pool2d(
        torch.tensor(x), 3, 2, padding=1).numpy()
    np.testing.assert_allclose(got, ref)
    got = _run1("AveragePool", {"x": x}, kernel_shape=(2, 2),
                strides=(2, 2))[0]
    ref = torch.nn.functional.avg_pool2d(torch.tensor(x), 2, 2).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_batchnorm_layernorm(rng):
    x = rng.standard_normal((2, 5, 9)).astype(np.float32)
    scale = rng.standard_normal((5,)).astype(np.float32)
    bias = rng.standard_normal((5,)).astype(np.float32)
    mean = rng.standard_normal((5,)).astype(np.float32)
    var = rng.random((5,)).astype(np.float32) + 0.5
    got = _run1("BatchNormalization", {"x": x},
                {"s": scale, "b": bias, "m": mean, "v": var},
                epsilon=1e-5)[0]
    ref = torch.nn.functional.batch_norm(
        torch.tensor(x), torch.tensor(mean), torch.tensor(var),
        torch.tensor(scale), torch.tensor(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    g = rng.standard_normal((9,)).astype(np.float32)
    b2 = rng.standard_normal((9,)).astype(np.float32)
    got = _run1("LayerNormalization", {"x": x}, {"g": g, "b": b2},
                axis=-1)[0]
    ref = torch.nn.functional.layer_norm(
        torch.tensor(x), (9,), torch.tensor(g), torch.tensor(b2)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_activations_and_softmax(rng):
    x = rng.standard_normal((3, 7)).astype(np.float32)
    for op, tfn in (("Relu", torch.relu), ("Sigmoid", torch.sigmoid),
                    ("Tanh", torch.tanh), ("Erf", torch.erf),
                    ("Softplus", torch.nn.functional.softplus)):
        got = _run1(op, {"x": x})[0]
        np.testing.assert_allclose(got, tfn(torch.tensor(x)).numpy(),
                                   rtol=1e-5, atol=1e-6)
    got = _run1("Softmax", {"x": x}, axis=1)[0]
    np.testing.assert_allclose(
        got, torch.softmax(torch.tensor(x), 1).numpy(), rtol=1e-5, atol=1e-6)
    got = _run1("LogSoftmax", {"x": x}, axis=-1)[0]
    np.testing.assert_allclose(
        got, torch.log_softmax(torch.tensor(x), -1).numpy(),
        rtol=1e-5, atol=1e-6)
    slope = np.asarray([0.1, 0.3, 0.5], np.float32)
    x3 = rng.standard_normal((2, 3, 4)).astype(np.float32)
    got = _run1("PRelu", {"x": x3}, {"s": slope})[0]
    ref = torch.nn.functional.prelu(
        torch.tensor(x3), torch.tensor(slope)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_shape_plumbing(rng):
    x = rng.standard_normal((2, 6, 5)).astype(np.float32)
    got = _run1("Transpose", {"x": x}, perm=(2, 0, 1))[0]
    np.testing.assert_array_equal(got, x.transpose(2, 0, 1))
    got = _run1("Reshape", {"x": x}, {"s": np.asarray([2, -1], np.int64)})[0]
    np.testing.assert_array_equal(got, x.reshape(2, -1))
    parts = _run1("Split", {"x": x}, axis=1, n_out=3)
    assert [p.shape[1] for p in parts] == [2, 2, 2]
    got = _run1("Slice", {"x": x},
                {"st": np.asarray([1], np.int64),
                 "en": np.asarray([4], np.int64),
                 "ax": np.asarray([1], np.int64),
                 "sp": np.asarray([2], np.int64)})[0]
    np.testing.assert_array_equal(got, x[:, 1:4:2])
    got = _run1("Unsqueeze", {"x": x}, {"ax": np.asarray([0, 3], np.int64)})[0]
    assert got.shape == (1, 2, 6, 1, 5)
    got = _run1("Gather", {"x": x}, {"i": np.asarray([2, 0], np.int64)},
                axis=1)[0]
    np.testing.assert_array_equal(got, x[:, [2, 0]])
    got = _run1("Pad", {"x": x},
                {"p": np.asarray([0, 0, 2, 0, 0, 3], np.int64)})[0]
    assert got.shape == (2, 6, 10)
    got = _run1("ReduceMean", {"x": x}, axes=(2,), keepdims=0)[0]
    np.testing.assert_allclose(got, x.mean(2), rtol=1e-6)


def test_gemm_attrs(rng):
    a = rng.standard_normal((4, 3)).astype(np.float32)
    w = rng.standard_normal((5, 3)).astype(np.float32)
    c = rng.standard_normal((5,)).astype(np.float32)
    got = _run1("Gemm", {"a": a}, {"w": w, "c": c}, transB=1, alpha=2.0,
                beta=0.5)[0]
    np.testing.assert_allclose(got, 2.0 * (a @ w.T) + 0.5 * c, rtol=1e-5)


def test_attribute_roundtrip():
    # negative ints, floats, strings survive the wire
    b = GraphBuilder()
    x = b.input("x")
    y = b.node("Slice", [x], starts=(-3,), ends=(2147483647,), axes=(0,))
    b.output(y)
    from sherpa_vietnamese_asr_tpu.models.onnx_import import read_onnx
    g = read_onnx(b.build())
    assert g["attrs"][0]["starts"] == [-3]
    arr = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(run_onnx(g, {"x": arr})[0], arr[-3:])
