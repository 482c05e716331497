# TranscriberPipeline — the batch transcription entry point.
#
# Public-API parity with the reference's TranscriberPipeline
# (reference core/asr_engine.py:1877-3459): same constructor shape
# (file_path, model, config, progress_callback, cancel_check), same PHASE
# progress protocol (asr_engine.py:1904-1928), same result_data contract
# (asr_engine.py:3434-3452). The execution model differs by design: every
# model stage runs as a batched, jitted XLA program on TPU (chunks decoded as
# one padded batch instead of a 2-thread CPU worker pool).
#
# Stage order (asr_engine.py:1964-3459):
#   load audio -> VAD -> [preprocess] -> merge VAD gaps -> concat speech ->
#   silence-aware 30s/3s chunk plan -> batched decode [-> ROVER] ->
#   overlap merge -> [DNSMOS] -> suspect detect -> filler removal ->
#   [diarization] -> [punctuation/alignment] -> split long segments -> result.

from __future__ import annotations

import os
import time

import numpy as np

from sherpa_vietnamese_asr_tpu.models.registry import AsrModel
from sherpa_vietnamese_asr_tpu.pipeline import chunking, vad as vad_mod
from sherpa_vietnamese_asr_tpu.pipeline.decoder import BatchedChunkDecoder
from sherpa_vietnamese_asr_tpu.pipeline.merge import (
    merge_chunks_with_overlap,
    split_long_segments,
)
from sherpa_vietnamese_asr_tpu.pipeline.suspect import (
    remove_filler_words,
    suspect_detect,
)
from sherpa_vietnamese_asr_tpu.utils.audio_io import load_audio

SAMPLE_RATE = 16000


def segment_words_by_pause(all_words, max_words=15, pause_sec=0.8):
    """Pause-based segmentation used when punctuation is off or failed
    (reference asr_engine.py:3338-3408): close a segment on a >0.8 s gap or
    after 15 words; segments carry their raw_words slice."""
    segments = []
    cur, start, start_idx = [], -1.0, 0
    for i, w in enumerate(all_words):
        if start < 0:
            start, start_idx = w["start"], i
        cur.append(w["text"])
        pause = (i < len(all_words) - 1
                 and all_words[i + 1]["start"] - w["end"] > pause_sec)
        if pause or len(cur) > max_words:
            segments.append({"text": " ".join(cur).strip(), "start": start,
                             "end": w["end"],
                             "raw_words": all_words[start_idx: i + 1]})
            cur, start = [], -1.0
    if cur:
        segments.append({"text": " ".join(cur).strip(), "start": start,
                         "end": all_words[-1]["end"],
                         "raw_words": all_words[start_idx:]})
    return segments


def fix_overlapping_segments(segments):
    """Clip each segment's end (and raw_words times) to the next segment's
    start (asr_engine.py:3303-3314)."""
    for i in range(len(segments) - 1):
        nxt = segments[i + 1]["start"]
        if segments[i]["end"] > nxt:
            segments[i]["end"] = nxt
        for w in segments[i].get("raw_words", []):
            if w["end"] > nxt:
                w["end"] = nxt
            if w["start"] > nxt:
                w["start"] = nxt
    return segments


class TranscriberPipeline:
    """Offline long-form transcription pipeline (TPU-native).

    Args:
        file_path: audio file (WAV natively; others via ffmpeg if present).
        model: AsrModel bundle (or [model_a, model_b] for ROVER later).
        config: dict — supported keys (reference asr_engine.py:1979-2012):
            bypass_vad, skip_preprocessing, preprocess_rms_normalize,
            max_batch, save_ram (accepted, no-op on TPU), rover_mode (later),
            speaker_diarization (later), restore_punctuation (later).
        progress_callback: callable(str) receiving "PHASE:<Name>|<msg>|<pct>".
        cancel_check: callable() -> bool.
    """

    def __init__(self, file_path, model: AsrModel, config=None,
                 progress_callback=None, cancel_check=None,
                 vad_prob_fn=None, punct_restorer=None, diarizer=None,
                 quality_analyzer=None):
        self.file_path = file_path
        # ROVER mode: pass (model_a, model_b) (reference selects it via the
        # "rover-voting" model id, asr_engine.py:899-901).
        if isinstance(model, (tuple, list)):
            self.model, self.model_b = model[0], model[1]
        else:
            self.model, self.model_b = model, None
        self.config = dict(config or {})
        self.progress_callback = progress_callback
        self.cancel_check = cancel_check
        self.vad_prob_fn = vad_prob_fn  # callable(audio)->probs, or None
        self.punct_restorer = punct_restorer  # pipeline.punctuation instance
        self.diarizer = diarizer  # pipeline.diarization_pure.PureDiarizer
        self.quality_analyzer = quality_analyzer  # pipeline.quality instance
        # Default construction from config flags (the reference's engine
        # builds these internally, asr_engine.py:1940-2040): callers like
        # the web-service queue pass only the config dict.
        if (self.diarizer is None
                and self.config.get("speaker_diarization", False)):
            from sherpa_vietnamese_asr_tpu.pipeline.diarization import (
                SPEAKER_EMBEDDING_MODELS, SpeakerDiarizer,
            )
            model_key = self.config.get("speaker_model", "pure_ort")
            model_id = model_key if model_key in SPEAKER_EMBEDDING_MODELS \
                else "community1_pure_ort"
            self.diarizer = SpeakerDiarizer(
                embedding_model_id=model_id,
                num_clusters=int(self.config.get("num_speakers", 0)) or -1,
                threshold=float(self.config.get("diarization_threshold",
                                                0.6)))
        if (self.quality_analyzer is None
                and self.config.get("quality_analysis", False)):
            from sherpa_vietnamese_asr_tpu.pipeline.quality import (
                QualityAnalyzer,
            )
            self.quality_analyzer = QualityAnalyzer()
        if (self.punct_restorer is None
                and self.config.get("restore_punctuation", False)
                and not self.config.get("bypass_restorer", False)):
            from sherpa_vietnamese_asr_tpu.pipeline.punctuation import (
                build_punctuation_restorer,
            )
            self.punct_restorer = build_punctuation_restorer(
                confidence=float(self.config.get("punctuation_confidence",
                                                 0.3)),
                case_confidence=float(self.config.get("case_confidence",
                                                      0.0)),
                prefer_int8=bool(self.config.get("prefer_int8", False)))
        self._phase_file = str(file_path) + ".asr_phase"

    # -- progress protocol (asr_engine.py:1904-1928) --
    def _emit(self, message: str):
        if self.progress_callback:
            self.progress_callback(message)
        if message.startswith("PHASE:"):
            try:
                with open(self._phase_file, "w", encoding="utf-8") as f:
                    f.write(message)
            except OSError:
                pass

    def _cancelled(self):
        return self.cancel_check is not None and self.cancel_check()

    def _max_batch(self):
        """Decode batch size: explicit config wins; 0 means auto — consume
        the calibrate --autotune recommendation (reference batch autotune,
        core/calibration.py:968) or the HBM-tiered heuristic."""
        from sherpa_vietnamese_asr_tpu.pipeline.calibration import (
            resolve_max_batch,
        )
        return resolve_max_batch(self.config)

    def run(self):
        t0 = time.time()
        timing = {"upload_convert": 0.0, "transcription": 0.0,
                  "sentence_segmentation": 0.0, "punctuation": 0.0,
                  "alignment": 0.0, "diarization": 0.0, "quality": 0.0,
                  "preprocessing": 0.0, "vad": 0.0}
        try:
            result = self._run(t0, timing)
        finally:
            try:
                os.remove(self._phase_file)
            except OSError:
                pass
        return result

    # -- resume checkpoints (the reference PWA persists VAD/decode state for
    # resume, offline_pwa app.js:3388-3577; this is the server-side analogue,
    # opt-in via config enable_resume) --
    @property
    def _ckpt_path(self):
        return str(self.file_path) + ".asr_ckpt.json"

    def _load_checkpoint(self):
        import json

        if not self.config.get("enable_resume", False):
            return None
        try:
            with open(self._ckpt_path, "r", encoding="utf-8") as f:
                ck = json.load(f)
            if ck.get("version") == 1 and ck.get("stage") == "decoded":
                return ck
        except (OSError, ValueError):
            pass
        return None

    def _save_checkpoint(self, all_words, full_text, concat_len, vad_probs):
        import json

        if not self.config.get("enable_resume", False):
            return
        try:
            with open(self._ckpt_path, "w", encoding="utf-8") as f:
                json.dump({
                    "version": 1, "stage": "decoded",
                    "full_text": full_text,
                    "all_words": all_words,
                    "concat_len": concat_len,
                    "vad_probs": (np.asarray(vad_probs, np.float32)
                                  .round(4).tolist()
                                  if vad_probs is not None else None),
                }, f, ensure_ascii=False)
        except (OSError, TypeError):
            pass

    def _clear_checkpoint(self):
        try:
            os.remove(self._ckpt_path)
        except OSError:
            pass

    def _run(self, t0, timing):
        self._emit("PHASE:LoadAudio|Loading audio|0")
        t_load = time.time()
        audio = load_audio(self.file_path, SAMPLE_RATE,
                           progress_callback=self._emit)
        timing["load_audio"] = time.time() - t_load
        total_samples = len(audio)
        if self._cancelled():
            return None

        ckpt = self._load_checkpoint()
        if ckpt is not None:
            self._emit("PHASE:Transcription|Resuming from checkpoint|100")
            vad_probs = (np.asarray(ckpt["vad_probs"], np.float32)
                         if ckpt.get("vad_probs") is not None else None)
            return self._finish(
                t0, timing, audio, total_samples, ckpt["all_words"],
                ckpt["full_text"], audio[: ckpt.get("concat_len",
                                                    total_samples)],
                vad_probs, is_rover=False)

        # ---- VAD -> concat -> chunk plan ----
        t_vad = time.time()
        vad_probs = None
        try:
            if self.config.get("bypass_vad", False):
                raise RuntimeError("VAD_BYPASSED_BY_USER")
            prob_fn = self.vad_prob_fn or self._default_vad_prob_fn()
            self._emit("PHASE:VAD|Detecting speech|0")

            def cached_prob_fn(a):
                nonlocal vad_probs
                vad_probs = np.asarray(prob_fn(a))
                return vad_probs

            segs = vad_mod.get_vad_segments(audio, cached_prob_fn,
                                            progress_callback=self._emit)
            self._emit(f"PHASE:VAD|Found {len(segs)} speech segments|100")
            # Preprocess on the full audio with global VAD context
            # (asr_engine.py:2099-2115)
            if not self.config.get("skip_preprocessing", False):
                try:
                    from sherpa_vietnamese_asr_tpu.pipeline.preprocessing \
                        import preprocess_audio
                    t_pre = time.time()
                    audio = preprocess_audio(
                        audio, segs, SAMPLE_RATE,
                        enable_rms_normalize=self.config.get(
                            "preprocess_rms_normalize", False),
                        progress_callback=self._emit)
                    timing["preprocessing"] = time.time() - t_pre
                except Exception:
                    pass
            segs = chunking.merge_vad_gaps(segs)
            concat_audio, offset_map = vad_mod.concat_speech(audio, segs)
        except Exception as e:
            if str(e) != "VAD_BYPASSED_BY_USER":
                self._emit(f"PHASE:LoadAudio|VAD failed ({e}); "
                           "silence-based chunking|60")
            concat_audio = audio
            offset_map = [(0, 0, total_samples)]
        timing["vad"] = time.time() - t_vad
        if self._cancelled():
            return None

        # ---- Diarization overlapped with decode (round 4) ----
        # Diarization is transcript-independent (reference asr_engine.py:2606
        # runs it serially after decode); start its backend now so its device
        # programs interleave with decode batches and its host-side
        # clustering rides the decode wait. _finish()'s process() call
        # consumes the result.
        if (self.config.get("speaker_diarization", False)
                and self.diarizer is not None
                and self.config.get("diarize_overlap_decode", True)):
            from sherpa_vietnamese_asr_tpu.pipeline.diarization import (
                SpeakerDiarizer,
            )
            if isinstance(self.diarizer, SpeakerDiarizer):
                try:
                    self._emit("PHASE:Transcription|Transcribing "
                               "(diarization in background)|0")
                    self.diarizer.start_background(audio)
                except Exception:
                    pass  # process() falls back to a synchronous run

        # ---- DNSMOS quality overlapped with decode (round 5) ----
        # analyze_speech is transcript-independent and needs only the
        # speech-only concat audio, so its window batches can interleave
        # with decode dispatches instead of adding a serial stage in
        # _finish (the reference runs it serially between decode and
        # diarization, asr_engine.py:2496-2528).
        self._quality_bg = None
        if self.quality_analyzer is not None \
                and self.config.get("quality_overlap_decode", True):
            import threading
            qbg = {"done": threading.Event()}

            def _quality_worker(ca=concat_audio):
                t_q = time.time()
                try:
                    qbg["result"] = self.quality_analyzer.analyze_speech(ca)
                except Exception:
                    qbg["result"] = None
                finally:
                    qbg["sec"] = time.time() - t_q
                    qbg["done"].set()

            qbg["thread"] = threading.Thread(target=_quality_worker,
                                             daemon=True,
                                             name="svt-quality-bg")
            self._quality_bg = qbg
            qbg["thread"].start()

        silent = chunking.find_silent_regions(concat_audio)
        plan = chunking.plan_chunks(len(concat_audio), silent)

        # ---- Batched decode (shared fbank in ROVER mode) ----
        t_dec = time.time()
        is_rover = self.model_b is not None
        label = "Transcribing (ROVER)" if is_rover else "Transcribing"
        self._emit(f"PHASE:Transcription|{label}|0")
        chunk_transform = None
        if self.config.get("preprocess_wpe", False):
            from sherpa_vietnamese_asr_tpu.pipeline.preprocessing import (
                adaptive_peak_limit, apply_wpe_dereverberation,
            )

            def chunk_transform(chunk):
                try:
                    return adaptive_peak_limit(
                        apply_wpe_dereverberation(chunk))
                except Exception:
                    return chunk
        # Lossless int16 upload when the audio is 16-bit-PCM-sourced and no
        # float-valued per-chunk transform runs: halves the decode stage's
        # host->device bytes (the dominant cost of a warm decode on this
        # tunnel) with BIT-IDENTICAL tokens — k/32768 floats round-trip the
        # int16 quantization exactly (utils/audio_io.is_int16_exact).
        transfer_dtype = self.config.get("decode_transfer_dtype")
        if transfer_dtype is None and chunk_transform is None:
            from sherpa_vietnamese_asr_tpu.utils.audio_io import (
                is_int16_exact,
            )
            if is_int16_exact(concat_audio):
                transfer_dtype = "int16"
        decoder = BatchedChunkDecoder(
            self.model, max_batch=self._max_batch(),
            model_b=self.model_b, chunk_transform=chunk_transform,
            transfer_dtype=transfer_dtype)
        spans = [(s, e) for s, e, _ in plan]
        decoded = decoder.decode_spans(
            concat_audio, spans, progress_callback=self._emit,
            cancel_check=self.cancel_check)
        if is_rover:
            from sherpa_vietnamese_asr_tpu.pipeline.rover import (
                rover_merge_words,
            )
            words_a_lists, words_b_lists = decoded
            hotword_phrases = self.config.get("hotword_phrases") or []
            chunk_words = []
            for wa, wb in zip(words_a_lists, words_b_lists):
                for w in wa + wb:
                    w["start"] = vad_mod.map_concat_time(w["start"], offset_map)
                    w["end"] = vad_mod.map_concat_time(w["end"], offset_map)
                merged, _ = rover_merge_words(wa, wb, hotword_phrases)
                chunk_words.append(merged)
        else:
            chunk_words = decoded
            for words in chunk_words:
                for w in words:
                    w["start"] = vad_mod.map_concat_time(w["start"], offset_map)
                    w["end"] = vad_mod.map_concat_time(w["end"], offset_map)

        chunk_results = []
        for (s, e, ov), words in zip(plan, chunk_words):
            chunk_results.append({
                "text": " ".join(w["text"] for w in words),
                "words": words,
                "audio_start_abs": s / SAMPLE_RATE,
                "audio_end_abs": e / SAMPLE_RATE,
                "overlap_sec": ov / SAMPLE_RATE,
            })
        timing["transcription"] = time.time() - t_dec
        if self._cancelled():
            return None

        # ---- Merge overlaps, suspects, fillers ----
        t_merge = time.time()
        from sherpa_vietnamese_asr_tpu.pipeline.rover import (
            rebuild_disagree_indices,
        )
        all_words, full_text = merge_chunks_with_overlap(chunk_results)
        disagree = rebuild_disagree_indices(all_words) if is_rover else None
        all_words = suspect_detect(all_words, audio,
                                   disagree_indices=disagree,
                                   vad_probs=vad_probs)
        all_words = remove_filler_words(all_words)
        full_text = " ".join(w["text"] for w in all_words)
        if full_text:
            full_text = full_text.capitalize()
        timing["merge_suspect"] = time.time() - t_merge

        self._save_checkpoint(all_words, full_text, len(concat_audio),
                              vad_probs)
        return self._finish(t0, timing, audio, total_samples, all_words,
                            full_text, concat_audio, vad_probs, is_rover)

    def _finish(self, t0, timing, audio, total_samples, all_words, full_text,
                concat_audio, vad_probs, is_rover):
        """Post-decode stages: quality, diarization, punctuation, assembly.
        Entered either from a live decode or from a resume checkpoint."""
        # ---- DNSMOS quality on speech-only audio (asr_engine.py:2496-2528) --
        quality_info = None
        if self.quality_analyzer is not None and concat_audio is not None:
            t_q = time.time()
            qbg = getattr(self, "_quality_bg", None)
            self._quality_bg = None
            if qbg is not None:
                self._emit("PHASE:QualityAnalysis|Analyzing audio quality|0")
                qbg["done"].wait()
                quality_info = qbg.get("result")
                self._emit("PHASE:QualityAnalysis|Done|100")
            if quality_info is None:  # no overlap, or the bg pass failed
                try:
                    self._emit("PHASE:QualityAnalysis|Analyzing audio "
                               "quality|0")
                    quality_info = self.quality_analyzer.analyze_speech(
                        concat_audio)
                    self._emit("PHASE:QualityAnalysis|Done|100")
                except Exception:
                    quality_info = None
            # what the stage cost the pipeline end-to-end (the overlapped
            # device time is recorded separately for the profile)
            timing["quality"] = time.time() - t_q
            if qbg is not None:
                timing["quality_overlapped"] = qbg.get("sec", 0.0)

        # ---- Speaker diarization (runs before punctuation; reference
        # asr_engine.py:2606-2756) ----
        raw_speaker_segments = None
        speaker_segments_raw = []
        word_speaker = None
        if self.config.get("speaker_diarization", False) \
                and self.diarizer is not None and all_words:
            from sherpa_vietnamese_asr_tpu.pipeline import diarization_post as dp

            t_diar = time.time()
            try:
                self._emit("PHASE:Diarization|Detecting speakers|0")

                def diar_progress(pct, total=100):
                    self._emit(f"PHASE:Diarization|Detecting speakers|{pct}")

                # self.diarizer is either the SpeakerDiarizer facade (returns
                # post-processed [Segment]) or a raw backend returning
                # [{"start","end","speaker"}] that still needs
                # post-processing (gap merge, NaturalTurn, fragment resolve).
                from sherpa_vietnamese_asr_tpu.pipeline.diarization import (
                    SpeakerDiarizer,
                )
                if isinstance(self.diarizer, SpeakerDiarizer):
                    raw_speaker_segments = self.diarizer.process(
                        audio, progress_callback=diar_progress,
                        asr_words=all_words)
                else:
                    raw = self.diarizer.process(
                        audio, progress_callback=diar_progress)
                    raw_speaker_segments = \
                        dp.post_process_diarization_segments(
                            [dp.Segment(s["start"], s["end"], s["speaker"])
                             for s in raw], asr_words=all_words)
                speaker_segments_raw = [{
                    "speaker": dp.speaker_name(s.speaker),
                    "speaker_id": s.speaker,
                    "start": s.start, "end": s.end,
                    "duration": s.end - s.start,
                } for s in raw_speaker_segments]
                word_speaker = dp.speaker_labels_for_words(
                    all_words, raw_speaker_segments)
                self._emit("PHASE:Diarization|Done|100")
                if self.config.get("overlap_separation", False):
                    ov_decoder = BatchedChunkDecoder(
                        self.model, max_batch=self._max_batch())
                    self._overlap_segments = self._run_overlap_separation(
                        audio, raw_speaker_segments, ov_decoder, timing)
            except Exception:
                import logging
                logging.getLogger(__name__).error("diarization failed",
                                                  exc_info=True)
                raw_speaker_segments = None
                word_speaker = None
            timing["diarization"] = time.time() - t_diar
        if self._cancelled():
            return None

        # ---- Punctuation + alignment, or pause-based segmentation ----
        final_segments = []
        restore = (self.config.get("restore_punctuation", False)
                   and self.punct_restorer is not None and full_text)
        if restore and not self.config.get("bypass_restorer", False):
            from sherpa_vietnamese_asr_tpu.pipeline.alignment import (
                align_sentences, align_sentences_with_speakers,
                build_pause_hints, split_sentences,
            )
            t_punct = time.time()
            try:
                self._emit("PHASE:Punctuation|Restoring punctuation|0")
                pause_hints = build_pause_hints(all_words,
                                                word_speaker=word_speaker)
                full_text = self.punct_restorer.restore(
                    full_text, pause_hints=pause_hints)
                timing["punctuation"] = time.time() - t_punct
                t_align = time.time()
                self._emit("PHASE:Align|Aligning timestamps|0")
                sentences = split_sentences(full_text)
                if word_speaker is not None:
                    from sherpa_vietnamese_asr_tpu.pipeline.diarization_post \
                        import smooth_speaker_boundary_fragments, speaker_name
                    names = [speaker_name(s) for s in word_speaker]
                    final_segments = align_sentences_with_speakers(
                        sentences, all_words, word_speaker, names)
                    final_segments = smooth_speaker_boundary_fragments(
                        final_segments)
                else:
                    final_segments = align_sentences(sentences, all_words)
                timing["alignment"] = time.time() - t_align
            except Exception:
                import logging
                logging.getLogger(__name__).error("punctuation failed",
                                                  exc_info=True)
                timing["punctuation"] = time.time() - t_punct
                final_segments = []
        t_align = time.time()
        if not final_segments:
            self._emit("PHASE:Align|Aligning timestamps|0")
            final_segments = segment_words_by_pause(all_words)
            if raw_speaker_segments is not None:
                from sherpa_vietnamese_asr_tpu.pipeline.diarization_post \
                    import (process_with_transcription,
                            smooth_speaker_boundary_fragments)
                final_segments = process_with_transcription(
                    final_segments, raw_speaker_segments)
                final_segments = smooth_speaker_boundary_fragments(
                    final_segments)
        final_segments = fix_overlapping_segments(final_segments)
        final_segments = split_long_segments(final_segments, max_duration=12.0,
                                             preserve_raw_words=True)
        timing["alignment"] += time.time() - t_align
        self._emit("PHASE:Align|Done|100")

        self._emit("PHASE:Complete|Done|100")
        total = time.time() - t0
        word_probs = [w.get("prob") for w in all_words
                      if w.get("prob") is not None]
        result_data = {
            "text": full_text,
            "segments": final_segments,
            "timing": {
                "transcription": timing["transcription"],
                "restoration": timing["punctuation"],
                "total": total,
                "upload_convert": timing["upload_convert"],
                "transcription_detail": timing["transcription"],
                "sentence_segmentation": timing["sentence_segmentation"],
                "punctuation": timing["punctuation"],
                "alignment": timing["alignment"],
                "diarization": timing["diarization"],
                "quality": timing["quality"],
                # Observability extras (additive to the reference contract):
                # where the non-device wall goes.
                "load_audio": timing.get("load_audio", 0.0),
                "vad": timing.get("vad", 0.0),
                "merge_suspect": timing.get("merge_suspect", 0.0),
                "quality_overlapped": timing.get("quality_overlapped", 0.0),
            },
            "paragraphs": [],
            "has_speaker_diarization": bool(speaker_segments_raw),
            "speaker_segments_raw": speaker_segments_raw,
            "duration_sec": total_samples / SAMPLE_RATE,
            "speaker_names": {},
            "asr_confidence": (float(np.mean(word_probs))
                               if word_probs else None),
            "quality_info": quality_info,
            "execution_provider": "tpu",
            "stage_execution_providers": {},
            "asr_provider_info": {"backend": "jax", "device": "tpu"},
            "overlap_segments": getattr(self, "_overlap_segments", []) or [],
        }
        self._clear_checkpoint()
        return result_data

    def _run_overlap_separation(self, audio, raw_speaker_segments, decoder,
                                timing):
        """Conv-TasNet separation of 2-speaker overlap regions + re-ASR of
        each stream (reference asr_engine.py:2758-2841). Returns parallel
        overlap segments for the result's overlap_segments field."""
        try:
            overlap_regions = (list(self.diarizer.overlap_regions)
                               if hasattr(self.diarizer, "overlap_regions")
                               else [])
            if not overlap_regions:
                return []
            t0 = time.time()
            self._emit(f"PHASE:OverlapSep|Separating overlaps "
                       f"({len(overlap_regions)} regions)|0")
            from sherpa_vietnamese_asr_tpu.pipeline.overlap import (
                OverlapSeparator,
            )
            sep = self.config.get("_overlap_separator") or OverlapSeparator()
            seg_dicts = [{"start": s.start, "end": s.end,
                          "speaker": s.speaker}
                         for s in raw_speaker_segments]
            results = sep.process(
                audio, seg_dicts, overlap_regions,
                progress_callback=lambda pct: self._emit(
                    f"PHASE:OverlapSep|Separating overlaps|{int(pct)}"))
            ov_segments = []
            for ri, reg in enumerate(results):
                self._emit(f"PHASE:OverlapSep|Re-ASR overlap "
                           f"{ri + 1}/{len(results)}|"
                           f"{int(50 + (ri + 1) / max(1, len(results)) * 40)}")
                for spk, spk_audio in reg["audio_per_speaker"].items():
                    real_s = reg["real_start_per_speaker"][spk]
                    real_e = reg["real_end_per_speaker"][spk]
                    try:
                        words = decoder.decode_spans(
                            spk_audio.astype(np.float32),
                            [(0, len(spk_audio))])
                        words = words[0] if not isinstance(words, tuple) \
                            else words[0][0]
                    except Exception:
                        continue
                    shift = reg["start"] - real_s
                    kept = [dict(w, start=w["start"] + shift,
                                 end=w["end"] + shift)
                            for w in words
                            if real_s <= (w["start"] + w["end"]) / 2
                            <= real_e]
                    text = " ".join(w["text"] for w in kept
                                    if w.get("text")).strip()
                    if not text:
                        continue
                    ov_segments.append({
                        "speaker": f"Người nói {spk + 1}",
                        "speaker_id": int(spk),
                        "start": reg["start"], "end": reg["end"],
                        "text": text, "raw_words": kept, "overlap": True,
                    })
            timing["overlap_separation"] = time.time() - t0
            self._emit(f"PHASE:OverlapSep|Done "
                       f"({len(ov_segments)} parallel segments)|100")
            return ov_segments
        except Exception:
            import logging
            logging.getLogger(__name__).error("overlap separation failed",
                                              exc_info=True)
            return []

    def _default_vad_prob_fn(self):
        """Silero VAD on device: real checkpoint via the asset registry when
        present, else a LOUDLY-flagged random-weight fallback (replaces the
        reference's silent per-window ORT session, core/vad_utils.py:22)."""
        from sherpa_vietnamese_asr_tpu.models import assets, silero_vad

        import jax

        loaded = assets.load_silero()
        if loaded is not None:
            params, cfg = loaded
            params = jax.device_put(params)  # one-time upload (host numpy)
        else:
            assets.warn_random("Silero VAD")
            cfg = silero_vad.SileroVadConfig()
            params = silero_vad.init_silero_params(jax.random.PRNGKey(0),
                                                   cfg)

        def prob_fn(a):
            # Blocked + int16 upload: one compiled program for any length,
            # half the host->device bytes (the link is ~20 MB/s).
            return silero_vad.silero_vad_probs_streamed(params, a, cfg=cfg)

        return prob_fn
