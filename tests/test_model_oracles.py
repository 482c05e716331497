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
