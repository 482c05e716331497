# Multi-chip sharded paths for the post-ASR stages (round 4): diarization
# superblocks, ViBERT/GEC minibatches, and DNSMOS shard their batch axis
# over the mesh "data" axis with replicated params. Each test pins
# sharded == single-device on the 8-virtual-device CPU mesh.
#
# Reference: these stages are serial single-session loops there
# (core/speaker_diarization_pure_ort.py:709,822; core/gec_model.py:374-399;
# core/audio_analyzer.py:248-331) — the TPU design generalizes the decode
# pool's data parallelism to every device-bound stage.
import jax
import numpy as np
import pytest


def _mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from sherpa_vietnamese_asr_tpu.parallel.sharding import make_mesh
    return make_mesh()


def test_dnsmos_sharded_matches_single_device(rng):
    from sherpa_vietnamese_asr_tpu.pipeline.quality import QualityAnalyzer

    mesh = _mesh()
    windows = [(0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
               for _ in range(3)]  # 3 pads up to the mesh-multiple 8
    plain = QualityAnalyzer(mesh=None)
    shard = QualityAnalyzer(mesh=mesh)
    s_plain = plain.compute_dnsmos_batch(windows)
    s_shard = shard.compute_dnsmos_batch(windows)
    assert len(s_plain) == len(s_shard) == 3
    for a, b in zip(s_plain, s_shard):
        for k in ("SIG", "BAK", "OVRL"):
            assert abs(a[k] - b[k]) < 1e-4


def test_gec_sharded_matches_single_device():
    from sherpa_vietnamese_asr_tpu.models.vibert import (
        TINY_VIBERT, init_vibert_params,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.gec import GecBert
    from sherpa_vietnamese_asr_tpu.utils.wordpiece import WordPieceTokenizer

    mesh = _mesh()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    for c in "abcdefghijklmnopqrstuvwxyz":
        vocab += [c, "##" + c]
    tok = WordPieceTokenizer(vocab)
    params = init_vibert_params(jax.random.PRNGKey(0), TINY_VIBERT)
    plain = GecBert(params, TINY_VIBERT, tok, mesh=None, mini_batch_size=8)
    shard = GecBert(params, TINY_VIBERT, tok, mesh=mesh, mini_batch_size=8)
    sents = [["xin", "chao", "viet", "nam"],
             ["hom", "nay", "troi", "dep", "rat", "vui"],
             ["mot", "hai", "ba"]]
    inp_p = plain.preprocess(sents)
    inp_s = shard.preprocess(sents)
    lg_p, dt_p = plain._run_model(inp_p)
    lg_s, dt_s = shard._run_model(inp_s)
    np.testing.assert_allclose(lg_s, lg_p, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(dt_s, dt_p, rtol=2e-4, atol=2e-5)
    # On-device decode path (round 4): label choices identical across mesh
    p_p, i_p, e_p = plain._run_decode(inp_p)
    p_s, i_s, e_s = shard._run_decode(inp_s)
    assert i_s == i_p
    np.testing.assert_allclose(p_s, p_p, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(e_s, e_p, rtol=2e-4, atol=2e-5)
    # End-to-end text identical too (tiny random model: output is arbitrary
    # but must be the SAME arbitrary text on both paths).
    text = "xin chao viet nam hom nay troi dep"
    assert plain(text) == shard(text)


def test_diarizer_superblock_sharded_matches_single_device(rng):
    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params,
    )
    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import TINY_RESNET
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        PureDiarizer,
    )

    mesh = _mesh()
    seg_cfg = PyanNetConfig(sinc_filters=16, conv_channels=12,
                            lstm_hidden=16, lstm_layers=1, linear_dim=16)
    kw = dict(seg_params=init_pyannet_params(jax.random.PRNGKey(3), seg_cfg),
              seg_cfg=seg_cfg, emb_cfg=TINY_RESNET, fused=True,
              transfer_dtype="float32", superblock_windows=4)
    sr = 16000
    t = np.arange(sr * 20) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
             + 0.02 * rng.standard_normal(len(t))).astype(np.float32)

    plain = PureDiarizer(mesh=None, **kw)
    shard = PureDiarizer(mesh=mesh, **kw)
    bin_p, starts_p, emb_p = plain._segment_and_embed_fused(audio)
    bin_s, starts_s, emb_s = shard._segment_and_embed_fused(audio)
    assert starts_s == starts_p
    assert len(starts_p) > kw["superblock_windows"]  # >1 superblock grouped
    np.testing.assert_array_equal(bin_s, bin_p)
    np.testing.assert_array_equal(np.isnan(emb_s[..., 0]),
                                  np.isnan(emb_p[..., 0]))
    both = ~np.isnan(emb_p[..., 0])
    cf, cc = emb_s[both], emb_p[both]
    cos = (cf * cc).sum(-1) / (np.linalg.norm(cf, axis=-1)
                               * np.linalg.norm(cc, axis=-1) + 1e-9)
    assert cos.min() > 0.9999
