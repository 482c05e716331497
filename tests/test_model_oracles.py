# Model-forward parity against independent oracles.
#
# The reference's correctness strategy is export-time numeric parity of each
# torch model vs its ONNX export (reference convert_onnx/
# export_convtasnet_onnx.py:66-89, SNR>40dB). This file inverts it: each JAX
# forward is validated against (a) genuinely independent upstream code where
# installed (transformers' BertModel for ViBERT, torch.nn primitives), and
# (b) first-party ONNX graph execution of synthesized structurally-real
# exports (tests/onnx_graphs.py + models/onnx_exec.py) elsewhere. Either
# catches a transposed weight, wrong activation, or wrong op order that the
# shape/mask tests of round 1 could not.
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_vibert_forward_matches_hf_bert(rng, tmp_path):
    """JAX ViBERT == transformers.BertModel + linear heads, weights imported
    through the ONNX name-map path (validates map AND math at once)."""
    from transformers import BertConfig, BertModel

    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_vibert
    from sherpa_vietnamese_asr_tpu.models.onnx_synth import GraphBuilder
    from sherpa_vietnamese_asr_tpu.models.vibert import vibert_forward

    torch.manual_seed(0)
    hf_cfg = BertConfig(
        vocab_size=211, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=96, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    bert = BertModel(hf_cfg, add_pooling_layer=False).eval()
    classifier = torch.nn.Linear(32, 15).eval()
    detector = torch.nn.Linear(32, 4).eval()

    b = GraphBuilder()
    for k, v in bert.state_dict().items():
        b.init("bert." + k, v.detach().numpy())
    for mod, name in ((classifier, "classifier"), (detector, "detector")):
        for k, v in mod.state_dict().items():
            b.init(f"{name}.{k}", v.detach().numpy())
    path = tmp_path / "vibert-capu.onnx"
    path.write_bytes(b.build())

    params, cfg = load_vibert(str(path))
    assert cfg.hidden == 32 and cfg.layers == 2 and cfg.intermediate == 64

    batch, t_len, words = 2, 17, 6
    ids = rng.integers(0, 211, (batch, t_len)).astype(np.int32)
    mask = np.ones((batch, t_len), np.int32)
    mask[0, 12:] = 0  # ragged row exercises the attention mask
    types = np.zeros((batch, t_len), np.int32)
    offs = np.sort(rng.integers(0, 12, (batch, words)), axis=1).astype(
        np.int32)

    logits, d_tags = vibert_forward(params, ids, mask, types, offs, cfg)

    with torch.no_grad():
        hidden = bert(input_ids=torch.tensor(ids, dtype=torch.long),
                      attention_mask=torch.tensor(mask, dtype=torch.long),
                      token_type_ids=torch.tensor(types, dtype=torch.long),
                      ).last_hidden_state
        gath = torch.gather(
            hidden, 1,
            torch.tensor(offs, dtype=torch.long)[:, :, None].expand(
                -1, -1, 32))
        ref_logits = classifier(gath).numpy()
        ref_d_tags = detector(gath).numpy()

    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d_tags), ref_d_tags,
                               rtol=2e-4, atol=2e-4)


def test_convtasnet_forward_matches_torch(rng, tmp_path):
    """JAX Conv-TasNet == asteroid-structured torch module, weights imported
    through the ONNX name-map path."""
    from tests.torch_refs import TorchConvTasNet, state_dict_to_onnx

    from sherpa_vietnamese_asr_tpu.models.convtasnet import (
        TINY_CONVTASNET, convtasnet_separate,
    )
    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_convtasnet

    torch.manual_seed(1)
    cfg = TINY_CONVTASNET
    ref = TorchConvTasNet(cfg).eval()
    path = tmp_path / "convtasnet_16k.onnx"
    state_dict_to_onnx(ref, path)

    params, got_cfg = load_convtasnet(str(path), cfg=None)
    assert got_cfg.n_filters == cfg.n_filters
    assert got_cfg.n_blocks * got_cfg.n_repeats == cfg.n_blocks * cfg.n_repeats

    t_len = 512  # (T - L) % stride == 0: no padding-edge ambiguity
    mix = rng.standard_normal((2, t_len)).astype(np.float32)
    got = np.asarray(convtasnet_separate(params, mix, cfg))
    with torch.no_grad():
        want = ref(torch.tensor(mix)).numpy()[:, :, :t_len]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pyannet_forward_matches_torch(rng, tmp_path):
    """JAX PyanNet == pyannote-structured torch module (SincNet front-end,
    4-layer BiLSTM, powerset log-softmax), weights via the importer."""
    from tests.torch_refs import TorchPyanNet, state_dict_to_onnx

    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_pyannet
    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, pyannet_forward,
    )

    torch.manual_seed(2)
    cfg = PyanNetConfig(sinc_filters=8, sinc_kernel=31, conv_channels=6,
                        lstm_hidden=8, lstm_layers=2, linear_dim=8)
    ref = TorchPyanNet(cfg).eval()
    path = tmp_path / "segmentation-community-1.onnx"
    state_dict_to_onnx(ref, path)

    params, _ = load_pyannet(str(path), cfg=cfg)
    wav = (rng.standard_normal((2, 4000)) * 0.1).astype(np.float32)
    got = np.asarray(pyannet_forward(params, wav, cfg))
    with torch.no_grad():
        want = ref(torch.tensor(wav)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_campp_forward_matches_torch(rng, tmp_path):
    """JAX CAM++ == 3D-Speaker-structured torch module (FCM front-end,
    D-TDNN CAM blocks, unbiased-std stats pooling), weights via load_campp.
    Architecture per the reference's own exporter
    (convert_onnx/export_campplus_onnx.py)."""
    from tests.torch_refs import (
        TorchCampp, randomize_bn_stats, state_dict_to_onnx,
    )

    from sherpa_vietnamese_asr_tpu.models.campplus import (
        TINY_CAMPP, campp_embed,
    )
    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_campp

    torch.manual_seed(3)
    cfg = TINY_CAMPP
    ref = TorchCampp(cfg).eval()
    randomize_bn_stats(ref, seed=3)
    path = tmp_path / "campplus_cn_en_common_200k.onnx"
    state_dict_to_onnx(ref, path)

    params, got_cfg = load_campp(str(path), cfg=None)
    assert got_cfg.embed_dim == cfg.embed_dim
    assert got_cfg.block_layers == cfg.block_layers

    # T=250 exercises the ceil-mode partial segment in CAM seg-pooling
    feats = rng.standard_normal((2, 250, cfg.num_mels)).astype(np.float32)
    got = np.asarray(campp_embed(params, feats, cfg))
    with torch.no_grad():
        want = ref(torch.tensor(feats)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_resnet_speaker_forward_matches_torch(rng, tmp_path):
    """JAX ResNet34 frame encoder + masked stats pool + split Gemm ==
    wespeaker-structured torch module + the reference's numpy pooling
    formula (pure_ort.py:756-767), weights via load_resnet_speaker."""
    from tests.torch_refs import (
        TorchResNetSpeaker, randomize_bn_stats, state_dict_to_onnx,
    )

    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        load_resnet_speaker,
    )
    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import (
        TINY_RESNET, project_embedding, resnet_frame_features,
    )
    from sherpa_vietnamese_asr_tpu.ops.stats_pool import masked_stats_pool

    torch.manual_seed(4)
    cfg = TINY_RESNET
    ref = TorchResNetSpeaker(cfg).eval()
    randomize_bn_stats(ref, seed=4)
    sd = ref.state_dict()
    w = sd.pop("resnet.seg_1.weight").numpy()
    bias = sd.pop("resnet.seg_1.bias").numpy()
    path = tmp_path / "embedding_encoder.onnx"
    from sherpa_vietnamese_asr_tpu.models.onnx_synth import GraphBuilder
    b = GraphBuilder()
    for k, v in sd.items():
        b.init(k, v.detach().numpy())
    path.write_bytes(b.build())
    np.save(tmp_path / "resnet_seg_1_weight.npy", w)
    np.save(tmp_path / "resnet_seg_1_bias.npy", bias)

    params, got_cfg = load_resnet_speaker(
        str(path), str(tmp_path / "resnet_seg_1_weight.npy"),
        str(tmp_path / "resnet_seg_1_bias.npy"), cfg=None)
    assert got_cfg.base_channels == cfg.base_channels
    assert got_cfg.blocks == cfg.blocks

    fbank = rng.standard_normal((2, 96, cfg.num_mels)).astype(np.float32)
    feats = np.asarray(resnet_frame_features(params, fbank, cfg))
    with torch.no_grad():
        want_feats = ref(torch.tensor(fbank)).numpy()
    np.testing.assert_allclose(feats, want_feats, rtol=2e-4, atol=2e-4)

    # masked stats pool + Gemm against the reference's numpy formula
    t_out = feats.shape[-1]
    weights = (rng.random((2, 3, t_out)) > 0.4).astype(np.float32)
    stats = np.asarray(masked_stats_pool(feats, weights))
    emb = np.asarray(project_embedding(params, stats))
    for bi in range(2):
        for s in range(3):
            wv = weights[bi, s][None, :]
            v1 = wv.sum() + 1e-8
            mean = (want_feats[bi] * wv).sum(axis=1) / v1
            dx2 = (want_feats[bi] - mean[:, None]) ** 2
            v2 = (wv * wv).sum()
            var = (dx2 * wv).sum(axis=1) / (v1 - v2 / v1 + 1e-8)
            ref_stats = np.concatenate([mean, np.sqrt(var)])
            ref_emb = ref_stats @ w.T + bias
            np.testing.assert_allclose(emb[bi, s], ref_emb, rtol=2e-3,
                                       atol=2e-3)


def _silero_v5_file(rng, tmp_path, n_freq=33, filt=64, channels=(16, 24),
                    hid=20):
    """Synthesize a Silero-v5-named ONNX file (traced-graph names per the
    public silero_vad_16k_op15.onnx; reference core/vad_utils.py:22)."""
    from sherpa_vietnamese_asr_tpu.models.onnx_synth import GraphBuilder

    b = GraphBuilder()
    basis = rng.standard_normal((2 * n_freq, 1, filt)).astype(np.float32)
    b.init("_model.stft.forward_basis_buffer", basis)
    c_in = n_freq
    for i, c_out in enumerate(channels):
        b.init(f"_model.encoder.{i}.reparam_conv.weight",
               rng.standard_normal((c_out, c_in, 3)).astype(np.float32) * 0.2)
        b.init(f"_model.encoder.{i}.reparam_conv.bias",
               rng.standard_normal((c_out,)).astype(np.float32) * 0.1)
        c_in = c_out
    b.init("_model.decoder.rnn.weight_ih",
           rng.standard_normal((4 * hid, c_in)).astype(np.float32) * 0.2)
    b.init("_model.decoder.rnn.weight_hh",
           rng.standard_normal((4 * hid, hid)).astype(np.float32) * 0.2)
    b.init("_model.decoder.rnn.bias_ih",
           rng.standard_normal((4 * hid,)).astype(np.float32) * 0.1)
    b.init("_model.decoder.rnn.bias_hh",
           rng.standard_normal((4 * hid,)).astype(np.float32) * 0.1)
    b.init("_model.decoder.decoder.2.weight",
           rng.standard_normal((1, hid, 1)).astype(np.float32) * 0.2)
    b.init("_model.decoder.decoder.2.bias",
           rng.standard_normal((1,)).astype(np.float32) * 0.1)
    path = tmp_path / "silero_vad_16k_op15.onnx"
    path.write_bytes(b.build())
    return path


def test_silero_import_and_torch_parity(rng, tmp_path):
    """load_silero_vad maps the v5 names; window_features + lstm_scan match
    the same graph built from torch primitives (conv1d + LSTMCell)."""
    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_silero_vad
    from sherpa_vietnamese_asr_tpu.models.silero_vad import (
        lstm_scan, window_features,
    )

    path = _silero_v5_file(rng, tmp_path)
    params, cfg = load_silero_vad(str(path))
    assert cfg.n_freq == 33 and cfg.encoder_channels == (16, 24)
    assert cfg.lstm_dim == 20

    n_win, win_len = 6, cfg.context + cfg.window
    wins = (rng.standard_normal((n_win, win_len)) * 0.1).astype(np.float32)
    feats = np.asarray(window_features(params, wins, cfg))
    probs, _ = lstm_scan(params, feats)
    probs = np.asarray(probs)

    # torch mirror from the SOURCE (v5-layout) tensors
    from sherpa_vietnamese_asr_tpu.models.onnx_import import read_onnx
    init = read_onnx(str(path))["initializers"]
    basis = torch.tensor(init["_model.stft.forward_basis_buffer"])
    x = torch.tensor(wins).unsqueeze(1)  # [N, 1, L]
    stft = torch.nn.functional.conv1d(x, basis, stride=cfg.stft_hop)
    re, im = stft[:, :33], stft[:, 33:]
    h = torch.sqrt(re * re + im * im + 1e-9)
    for i in range(2):
        w = torch.tensor(init[f"_model.encoder.{i}.reparam_conv.weight"])
        bias = torch.tensor(init[f"_model.encoder.{i}.reparam_conv.bias"])
        h = torch.relu(torch.nn.functional.conv1d(h, w, bias, padding=1))
    feat_t = h.mean(dim=-1)  # [N, C]
    np.testing.assert_allclose(feats, feat_t.numpy(), rtol=1e-4, atol=1e-5)

    cell = torch.nn.LSTMCell(24, 20)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.tensor(init["_model.decoder.rnn.weight_ih"]))
        cell.weight_hh.copy_(torch.tensor(init["_model.decoder.rnn.weight_hh"]))
        cell.bias_ih.copy_(torch.tensor(init["_model.decoder.rnn.bias_ih"]))
        cell.bias_hh.copy_(torch.tensor(init["_model.decoder.rnn.bias_hh"]))
        hx = torch.zeros(1, 20)
        cx = torch.zeros(1, 20)
        outs = []
        for t in range(n_win):
            hx, cx = cell(feat_t[t: t + 1], (hx, cx))
            outs.append(hx)
        hs = torch.cat(outs, 0)
        head_w = torch.tensor(init["_model.decoder.decoder.2.weight"])
        head_b = torch.tensor(init["_model.decoder.decoder.2.bias"])
        logits = hs @ head_w[0, :, 0].reshape(-1, 1) + head_b
        want = torch.sigmoid(logits)[:, 0].numpy()
    np.testing.assert_allclose(probs, want, rtol=1e-4, atol=1e-5)


def test_silero_streamed_matches_batch_after_import(rng, tmp_path):
    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_silero_vad
    from sherpa_vietnamese_asr_tpu.models.silero_vad import (
        silero_vad_probs, silero_vad_probs_streamed,
    )

    path = _silero_v5_file(rng, tmp_path)
    params, cfg = load_silero_vad(str(path))
    audio = (rng.standard_normal(cfg.window * 23) * 0.1).astype(np.float32)
    batch = np.asarray(silero_vad_probs(params, audio, cfg))
    streamed = silero_vad_probs_streamed(params, audio, block_windows=7,
                                         quantize=False, cfg=cfg)
    np.testing.assert_allclose(streamed, batch, rtol=1e-4, atol=1e-5)


def test_dnsmos_structural_import(rng, tmp_path):
    """load_dnsmos maps conv/dense tensors structurally (TF-origin export
    has no torch names); forward stays finite and order-faithful."""
    from sherpa_vietnamese_asr_tpu.models.dnsmos import (
        DnsmosConfig, dnsmos_forward,
    )
    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_dnsmos
    from sherpa_vietnamese_asr_tpu.models.onnx_synth import GraphBuilder

    b = GraphBuilder()
    x = b.input("input_1")
    chans = (8, 8, 16)
    c_in = 1
    cur = x
    for i, c in enumerate(chans):
        w = b.init(f"conv{i}/kernel", rng.standard_normal(
            (3, 3, c_in, c)).astype(np.float32) * 0.2)
        bb = b.init(f"conv{i}/bias",
                    rng.standard_normal((c,)).astype(np.float32) * 0.1)
        cur = b.node("Conv", [cur, w, bb], pads=(1, 1, 1, 1))
        c_in = c
    d1w = b.init("dense/kernel",
                 rng.standard_normal((16, 12)).astype(np.float32) * 0.2)
    d1b = b.init("dense/bias",
                 rng.standard_normal((12,)).astype(np.float32) * 0.1)
    cur = b.node("MatMul", [cur, d1w])
    cur = b.node("Add", [cur, d1b])
    hb_arr = rng.standard_normal((3,)).astype(np.float32) * 0.1
    hw = b.init("head/kernel",
                rng.standard_normal((12, 3)).astype(np.float32) * 0.2)
    hb = b.init("head/bias", hb_arr)
    cur = b.node("MatMul", [cur, hw])
    cur = b.node("Add", [cur, hb])
    b.output(cur)
    path = tmp_path / "sig_bak_ovr.onnx"
    path.write_bytes(b.build())

    params, cfg = load_dnsmos(str(path))
    assert cfg.channels == chans and cfg.dense == 12
    np.testing.assert_array_equal(
        np.asarray(params["head"]["bias"]), np.asarray(hb_arr))
    audio = (rng.standard_normal((1, 32000)) * 0.1).astype(np.float32)
    cfg_small = DnsmosConfig(channels=chans, dense=12)
    out = np.asarray(dnsmos_forward(params, audio, cfg_small))
    assert out.shape == (1, 3) and np.isfinite(out).all()


def test_rnnt_decoder_joiner_match_torch(rng):
    """icefall stateless decoder (Embedding + grouped bias-free Conv1d k=2 +
    ReLU) and joiner (tanh(enc_proj + dec_proj) @ out): JAX grouped-matmul
    einsum vs torch primitives."""
    import jax

    from sherpa_vietnamese_asr_tpu.models import rnnt as m

    cfg = m.RnntConfig(vocab_size=40, context_size=2, decoder_dim=16,
                       joiner_dim=12, encoder_out_dim=10)
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    dec = m.init_decoder_params(k1, cfg)
    joi = m.init_joiner_params(k2, cfg)

    ctx = rng.integers(0, 40, (5, 2)).astype(np.int32)
    got_dec = np.asarray(m.decoder_forward(dec, ctx, cfg))

    emb = torch.nn.Embedding(40, 16)
    conv = torch.nn.Conv1d(16, 16, 2, groups=16 // 4, bias=False)
    with torch.no_grad():
        emb.weight.copy_(torch.tensor(np.asarray(dec["embedding"])))
        conv.weight.copy_(torch.tensor(np.asarray(dec["conv_weight"])))
        e = emb(torch.tensor(ctx, dtype=torch.long))  # [N, K, D]
        want_dec = torch.relu(conv(e.permute(0, 2, 1))[:, :, 0]).numpy()
    np.testing.assert_allclose(got_dec, want_dec, rtol=1e-5, atol=1e-6)

    enc = rng.standard_normal((5, 10)).astype(np.float32)
    got_j = np.asarray(m.joiner_forward(joi, enc, got_dec))
    with torch.no_grad():
        ep = torch.tensor(enc) @ torch.tensor(
            np.asarray(joi["encoder_proj"]["weight"])) + torch.tensor(
            np.asarray(joi["encoder_proj"]["bias"]))
        dp = torch.tensor(want_dec) @ torch.tensor(
            np.asarray(joi["decoder_proj"]["weight"])) + torch.tensor(
            np.asarray(joi["decoder_proj"]["bias"]))
        want_j = (torch.tanh(ep + dp) @ torch.tensor(
            np.asarray(joi["output"]["weight"])) + torch.tensor(
            np.asarray(joi["output"]["bias"]))).numpy()
    np.testing.assert_allclose(got_j, want_j, rtol=1e-5, atol=1e-5)
