# GEC punctuation/case subsystem tests.
import numpy as np
import pytest


def _tiny_gec(**kw):
    import jax

    from sherpa_vietnamese_asr_tpu.models.vibert import (
        TINY_VIBERT, init_vibert_params,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.gec import GecBert
    from sherpa_vietnamese_asr_tpu.utils.wordpiece import WordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    for c in "abcdefghijklmnopqrstuvwxyz":
        vocab.append(c)
        vocab.append("##" + c)
    for w in ["xin", "chao", "viet", "nam", "hom", "nay", "troi", "dep",
              "rat", "vui", ",", ".", "?", ":"]:
        vocab.append(w)
    tok = WordPieceTokenizer(vocab)
    params = init_vibert_params(jax.random.PRNGKey(0), TINY_VIBERT)
    return GecBert(params, TINY_VIBERT, tok, **kw)


def test_wordpiece_tokenizer():
    from sherpa_vietnamese_asr_tpu.utils.wordpiece import WordPieceTokenizer
    tok = WordPieceTokenizer(["[PAD]", "[UNK]", "ab", "##cd", "##c", "x"])
    assert tok.tokenize_word("ab") == [2]
    assert tok.tokenize_word("abcd") == [2, 3]
    assert tok.tokenize_word("abc") == [2, 4]
    assert tok.tokenize_word("zzz") == [1]  # unk
    ids, wids = tok.encode_words(["ab", "x"])
    assert ids == [2, 5] and wids == [0, 1]


def test_get_target_sent_by_edits():
    from sherpa_vietnamese_asr_tpu.pipeline.gec import get_target_sent_by_edits
    tokens = ["xin", "chao", "viet", "nam"]
    # append period after "nam": get_token_action(index=4) yields (4, 4)
    out = get_target_sent_by_edits(tokens, [(4, 4, "$APPEND_.", 0.9)])
    assert out == ["xin", "chao", "viet", "nam", "."]
    # capitalization
    out = get_target_sent_by_edits(tokens, [(0, 1, "$TRANSFORM_CASE_CAPITAL", 0.9)])
    assert out == ["Xin", "chao", "viet", "nam"]
    # duplicate append suppressed
    out = get_target_sent_by_edits(["a", ".", "b"], [(1, 1, "$APPEND_.", 0.9)])
    assert out == ["a", ".", "b"]


def test_convert_pause_nudges():
    gec = _tiny_gec()
    n_labels = len(gec.labels)
    b, t = 1, 4  # START + 3 words
    logits = np.zeros((b, t, n_labels), np.float32)
    logits[:, :, gec.noop_index] = 5.0  # strong $KEEP everywhere
    detect = np.zeros((b, t, len(gec.d_tags)), np.float32)
    # word 0: gap 1.5s -> expect APPEND_. wins after nudge (+0.2 vs keep -0.2)
    # but keep prob is ~1.0 after softmax; nudge of 0.4 total is not enough
    # unless keep and append are close. Use closer logits for word 1.
    logits[0, 2, gec.noop_index] = 1.0
    logits[0, 2, gec.append_period_index] = 0.9
    hints = [[0.0, 1.5, 0.0]]
    probs, idxs, errs = gec._convert(logits.copy(), detect,
                                     pause_hints_batch=hints)
    assert idxs[0][2] == gec.append_period_index
    # without hints, $KEEP stays
    _, idxs2, _ = gec._convert(logits.copy(), detect)
    assert idxs2[0][2] == gec.noop_index
    # fast speech (<0.1s) suppresses a marginal comma
    logits3 = np.zeros((b, t, n_labels), np.float32)
    logits3[0, 1, gec.append_comma_index] = 1.0
    logits3[0, 1, gec.noop_index] = 0.9
    _, idxs3, _ = gec._convert(logits3.copy(), detect,
                               pause_hints_batch=[[0.05, 0.0, 0.0]])
    assert idxs3[0][1] == gec.noop_index


def test_run_decode_matches_host_convert():
    """On-device decode (round 4: _vibert_decode_jit, one packed upload,
    reduced downloads) == the host reference path _convert(_run_model(...)),
    including pause-hint nudging and confidence biases."""
    gec = _tiny_gec(mini_batch_size=4, confidence=0.05, case_confidence=0.02)
    sents = [["xin", "chao", "viet", "nam"],
             ["hom", "nay", "troi", "dep", "rat", "vui"],
             ["mot", "hai", "ba"],
             ["rat", "vui"],
             ["nam", "nay", "dep"]]  # 5 rows -> 2 minibatches of 4
    hints = [[0.0, 1.5, 0.0, 0.0], None, [0.05, 0.3, 0.0],
             [2.0, 0.0], None]
    inputs = gec.preprocess(sents)
    logits, detect = gec._run_model(inputs)
    p_ref, i_ref, e_ref = gec._convert(logits.copy(), detect,
                                       pause_hints_batch=hints)
    p_dev, i_dev, e_dev = gec._run_decode(inputs, hints_rows=hints)
    assert i_dev == i_ref
    np.testing.assert_allclose(p_dev, p_ref, atol=2e-6)
    np.testing.assert_allclose(e_dev, e_ref, atol=2e-6)
    # no-hints path too
    p2_ref, i2_ref, e2_ref = gec._convert(logits.copy(), detect)
    p2_dev, i2_dev, e2_dev = gec._run_decode(inputs)
    assert i2_dev == i2_ref
    np.testing.assert_allclose(p2_dev, p2_ref, atol=2e-6)


def test_split_and_merge_chunks_identity():
    gec = _tiny_gec(chunk_size=16, overlap_size=6, min_words_cut=2)
    words = [f"w{i}" for i in range(50)]
    chunks, indices, _ = gec.split_chunks([words])
    assert indices == [(0, len(chunks))]
    assert all(len(c) <= 16 for c in chunks)
    merged = gec.merge_chunks(chunks)
    assert merged == " ".join(words)


def test_gec_handle_batch_runs_with_random_weights():
    gec = _tiny_gec(chunk_size=16, overlap_size=6, min_words_cut=2,
                    mini_batch_size=4)
    text = "xin chao viet nam hom nay troi dep rat vui " * 4
    out = gec(text.strip())
    assert isinstance(out, list) and len(out) == 1
    assert isinstance(out[0], str) and len(out[0]) > 0


def test_post_process_rules():
    from sherpa_vietnamese_asr_tpu.pipeline.punctuation import (
        PunctuationRestorer,
    )
    pp = PunctuationRestorer.post_process
    assert pp("xin chao ,, viet nam") == "Xin chao, viet nam"
    assert pp("a : b") == "A b"
    assert pp("a ,. b") == "A. B"
    assert pp("xin chao. tam biet") == "Xin chao. Tam biet"
    # comma limit in short sentences (max 1 comma per <8-word sentence)
    out = pp("mot, hai, ba, bon nam.")
    assert out.count(",") == 1


def test_build_pause_hints_and_alignment():
    from sherpa_vietnamese_asr_tpu.pipeline.alignment import (
        align_sentences, build_pause_hints, split_sentences,
    )
    words = []
    t = 0.0
    for i, w in enumerate("xin chao viet nam hom nay troi dep".split()):
        words.append({"text": w, "start": t, "end": t + 0.2})
        t += 0.3 if i != 3 else 1.5  # big pause after "nam"
    hints = build_pause_hints(words)
    assert hints[3] > 1.0 and hints[-1] == 1.0
    assert abs(hints[0] - 0.1) < 1e-6
    # speaker boundary injection
    hints2 = build_pause_hints(words, word_speaker=[0, 0, 1, 1, 1, 1, 1, 1])
    assert hints2[1] >= 1.0

    text = "Xin chao viet nam. Hom nay troi dep."
    segs = align_sentences(split_sentences(text), words)
    assert len(segs) == 2
    assert segs[0]["text"] == "Xin chao viet nam."
    assert abs(segs[0]["start"] - 0.0) < 1e-6
    assert segs[1]["raw_words"][0]["text"] == "hom"


def test_align_sentences_with_speakers_split():
    from sherpa_vietnamese_asr_tpu.pipeline.alignment import (
        align_sentences_with_speakers, split_sentences,
    )
    words = []
    t = 0.0
    for w in "mot hai ba bon".split():
        words.append({"text": w, "start": t, "end": t + 0.2})
        t += 0.3
    spk = [0, 0, 1, 1]
    names = ["Người nói 1"] * 2 + ["Người nói 2"] * 2
    segs = align_sentences_with_speakers(
        split_sentences("Mot hai ba bon."), words, spk, names)
    assert len(segs) == 2
    assert segs[0]["speaker_id"] == 0 and segs[1]["speaker_id"] == 1
    assert segs[0]["text"].lower().startswith("mot")
    assert "ba" in segs[1]["text"]


def test_gec_shape_buckets_bounded_and_warmable():
    """preprocess buckets the minibatch dims to powers of two capped at 512
    so warm_shapes() can pre-compile the complete shape set (the cold-start
    contract: a warmed cache never compiles punctuation programs)."""
    gec = _tiny_gec(chunk_size=16, overlap_size=6, min_words_cut=2,
                    mini_batch_size=2)
    seen = set()
    for words in (["xin"] * 3, ["chao"] * 16, ["q" * 40] * 16,
                  ["z" * 300] * 16):
        inputs = gec.preprocess([words])
        t = inputs["input_ids"].shape[1]
        w = inputs["input_offsets"].shape[1]
        seen.add((t, w))
        assert t in (64, 128, 256, 512), t
        assert w in (64, 128, 256, 512), w
        assert inputs["input_ids"].shape[1] <= 512  # BERT position ceiling
    assert len(seen) > 1  # buckets actually vary with content
    gec.warm_shapes()  # compiles the full bucket set without error


def test_load_gec_vocabulary_matches_reference_format(tmp_path):
    """The AllenNLP vocabulary-directory loader reproduces the in-tree
    default label sets from files laid out exactly like the reference's
    vocabulary/ (non-padded *labels/*tags namespaces are 0-indexed as-is;
    padded namespaces get @@PADDING@@ prepended; @@NEWLINE@@ unescaped)."""
    from sherpa_vietnamese_asr_tpu.pipeline.gec import (
        DEFAULT_D_TAGS,
        DEFAULT_LABELS,
        load_gec_vocabulary,
    )

    vocdir = tmp_path / "vocabulary"
    vocdir.mkdir()
    (vocdir / "non_padded_namespaces.txt").write_text("*tags\n*labels\n")
    (vocdir / "labels.txt").write_text("\n".join(DEFAULT_LABELS) + "\n")
    (vocdir / "d_tags.txt").write_text("\n".join(DEFAULT_D_TAGS) + "\n")
    (vocdir / "tokens.txt").write_text("a\n@@NEWLINE@@\nb\n")

    ns = load_gec_vocabulary(str(vocdir))
    assert ns["labels"] == DEFAULT_LABELS
    assert ns["d_tags"] == DEFAULT_D_TAGS
    # 'tokens' is a padded namespace: padding token injected at index 0
    assert ns["tokens"] == ["@@PADDING@@", "a", "\n", "b"]

    # the loaded sets drive GecBert directly
    gec_labels = ns["labels"]
    assert gec_labels.index("$KEEP") == 0


def test_int8_tier_close_to_f32_and_runs():
    """Weight-only int8 ViBERT (reference ships vibert-capu.int8.onnx,
    core/gec_model.py:125-145): logits close to f32, linear weights 4x
    smaller, and the GEC loop runs end-to-end on the quantized tree."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.vibert import (
        TINY_VIBERT, init_vibert_params, quantize_vibert_int8, vibert_forward,
    )

    params = init_vibert_params(jax.random.PRNGKey(0), TINY_VIBERT)
    qparams = quantize_vibert_int8(params)
    assert qparams["layers"][0]["q"]["weight_q"].dtype == jnp.int8
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 200, (2, 24)).astype(np.int32)
    att = np.ones((2, 24), np.int32)
    tt = np.zeros((2, 24), np.int32)
    offs = np.arange(12, dtype=np.int32)[None].repeat(2, 0)
    lg, dt = vibert_forward(params, jnp.asarray(ids), jnp.asarray(att),
                            jnp.asarray(tt), jnp.asarray(offs), TINY_VIBERT)
    lgq, dtq = vibert_forward(qparams, jnp.asarray(ids), jnp.asarray(att),
                              jnp.asarray(tt), jnp.asarray(offs), TINY_VIBERT)
    # int8 weight rounding perturbs logits slightly but not wildly
    assert float(jnp.abs(lgq - lg).max()) < 0.2
    assert float(jnp.abs(dtq - dt).max()) < 0.2

    from sherpa_vietnamese_asr_tpu.pipeline.gec import GecBert
    from sherpa_vietnamese_asr_tpu.utils.wordpiece import WordPieceTokenizer
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    for c in "abcdefghijklmnopqrstuvwxyz":
        vocab += [c, "##" + c]
    gec = GecBert(qparams, TINY_VIBERT, WordPieceTokenizer(vocab),
                  mini_batch_size=4)
    out = gec("xin chao viet nam hom nay troi dep")
    assert isinstance(out, list) and len(out) == 1 and out[0]


def test_build_restorer_prefer_int8():
    from sherpa_vietnamese_asr_tpu.models.vibert import (
        TINY_VIBERT,
    )
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.pipeline import punctuation as pc

    # monkeypatch-free: builder falls back to random weights; force tiny by
    # building GecBert directly is covered above — here just exercise the
    # prefer_int8 plumbing with the default (full-size) config is too slow,
    # so patch ViBertConfig via the assets-less fallback path with tiny cfg.
    import sherpa_vietnamese_asr_tpu.models.vibert as vb
    orig = vb.ViBertConfig
    try:
        vb.ViBertConfig = lambda: TINY_VIBERT
        r = pc.build_punctuation_restorer(prefer_int8=True,
                                          mini_batch_size=4)
        lp = r.gec_model.params["layers"][0]["q"]
        assert lp["weight_q"].dtype == jnp.int8
        assert r.restore("xin chao viet nam") is not None
    finally:
        vb.ViBertConfig = orig
