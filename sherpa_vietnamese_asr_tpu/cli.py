# Command-line interface — the thin front-end replacing the reference's
# PyQt6 desktop shell (out of TPU-core scope per SURVEY.md section 2.4).
#
# Subcommands:
#   transcribe <audio> [--model ...] [--rover] [--diarize] [--punctuate]
#       -> prints text, writes <audio>.asr.json
#   serve [--host --port --data-dir] -> HTTP API (web_service/server.py)
#   bench -> one-line JSON benchmark (same as repo-root bench.py)
#   monitor -> RAM/CPU/disk sampler (resource_monitor equivalent)

from __future__ import annotations

import argparse
import json
import sys
import time


def _load_model(args):
    import os

    from sherpa_vietnamese_asr_tpu.models import assets
    from sherpa_vietnamese_asr_tpu.models.registry import (
        MODEL_30M, MODEL_68M, load_asr_model, random_asr_model,
    )

    if getattr(args, "models_dir", None):
        os.environ["SVT_MODELS_DIR"] = args.models_dir
    name = args.model
    dtype = getattr(args, "dtype", "float32")
    if os.path.isdir(name):
        return load_asr_model(name, beam_size=args.beam, compute_dtype=dtype)
    big = "68" in name or "2025" in name
    asset_key = "zipformer-68m" if big else "zipformer-30m"
    model_dir = assets.asr_model_dir(asset_key)
    if model_dir is not None:
        return load_asr_model(model_dir, beam_size=args.beam,
                              compute_dtype=dtype)
    canonical = MODEL_68M if big else MODEL_30M
    # Refuse silent garbage: random weights only behind an explicit flag
    # (VERDICT round 1: random init must be opt-in and loud).
    assets.require_real_or_allowed(
        f"ASR model {name}", getattr(args, "allow_random", False))
    return random_asr_model(canonical, beam_size=args.beam,
                            compute_dtype=dtype)


def cmd_transcribe(args):
    from sherpa_vietnamese_asr_tpu.pipeline.asr_json import (
        save_asr_json, serialize_segments,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.transcriber import (
        TranscriberPipeline,
    )

    model = _load_model(args)
    if getattr(args, "hotwords_file", None):
        import dataclasses
        import os

        from sherpa_vietnamese_asr_tpu.utils.config import (
            build_hotword_tables_for_model,
        )
        model_dir = args.model if os.path.isdir(args.model) else "."
        tables, kept = build_hotword_tables_for_model(
            model_dir, model.rnnt_cfg.vocab_size,
            hotwords_file=args.hotwords_file,
            default_score=args.hotwords_score)
        if tables is None:
            print("[cli] hotwords requested but no usable hotword file / "
                  "bpe.model found; continuing without", file=sys.stderr)
        else:
            model = dataclasses.replace(model, hotword_tables=tables)
            print(f"[cli] hotword boosting active for {len(kept)} phrases",
                  file=sys.stderr)
    if args.rover:
        from sherpa_vietnamese_asr_tpu.models.registry import (
            MODEL_68M, random_asr_model,
        )
        model = (model, random_asr_model(MODEL_68M, beam_size=args.beam))

    config = {
        "speaker_diarization": args.diarize,
        "restore_punctuation": args.punctuate,
        "max_batch": args.max_batch,
        "preprocess_rms_normalize": args.rms_normalize,
        "preprocess_wpe": args.wpe,
        "bypass_vad": args.no_vad,
        "enable_resume": args.enable_resume,
    }
    diarizer = None
    if args.diarize:
        import os

        from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
            PureDiarizer,
        )
        diarizer = PureDiarizer(
            num_speakers=args.num_speakers or -1,
            model_dir=args.model if os.path.isdir(args.model) else None)
    punct_restorer = None
    if args.punctuate:
        import os

        from sherpa_vietnamese_asr_tpu.pipeline.punctuation import (
            build_punctuation_restorer,
        )
        punct_restorer = build_punctuation_restorer(
            model_dir=args.model if os.path.isdir(args.model) else None)
    quality_analyzer = None
    if args.quality:
        from sherpa_vietnamese_asr_tpu.pipeline.quality import (
            QualityAnalyzer,
        )
        quality_analyzer = QualityAnalyzer()

    def progress(msg):
        if args.verbose and msg.startswith("PHASE:"):
            print(msg, file=sys.stderr)

    kw = dict(progress_callback=progress, diarizer=diarizer,
              punct_restorer=punct_restorer,
              quality_analyzer=quality_analyzer)
    t0 = time.time()
    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            result = TranscriberPipeline(args.audio, model, config,
                                         **kw).run()
        print(f"[cli] profiler trace written to {args.profile}",
              file=sys.stderr)
    else:
        result = TranscriberPipeline(args.audio, model, config, **kw).run()
    dt = time.time() - t0
    if result is None:
        print("cancelled", file=sys.stderr)
        return 1
    print(result["text"])
    rtfx = result["duration_sec"] / max(dt, 1e-6)
    print(f"[cli] {result['duration_sec']:.1f}s audio in {dt:.1f}s "
          f"({rtfx:.1f}x realtime), {len(result['segments'])} segments",
          file=sys.stderr)
    out_path = args.output or (args.audio + ".asr.json")
    data = serialize_segments(result["segments"],
                              model_name=getattr(model, "name", "rover"),
                              duration_sec=result["duration_sec"],
                              timing=result["timing"],
                              overlap_segments=result["overlap_segments"])
    data["text"] = result["text"]
    save_asr_json(out_path, data)
    print(f"[cli] wrote {out_path}", file=sys.stderr)
    return 0


def cmd_serve(args):
    from sherpa_vietnamese_asr_tpu.web_service.server import make_server

    models = {}

    def model_provider(name):
        if name not in models:
            ns = argparse.Namespace(model=name or "zipformer-30m-rnnt-6000h",
                                    beam=8,
                                    allow_random=args.allow_random,
                                    models_dir=args.models_dir)
            models[name] = _load_model(ns)
        return models[name]

    # --http forces plain HTTP; otherwise the persisted server config
    # decides (http_mode, reference default: HTTPS with a self-signed cert)
    server, _state = make_server(host=args.host, port=args.port,
                                 data_dir=args.data_dir,
                                 model_provider=model_provider,
                                 use_tls=False if args.http else None)
    if args.warmup:
        # Compile the hot programs before accepting work (first-request
        # latency drops from minutes to milliseconds). Same shapes the
        # pipeline will resolve for real requests (pipeline/warmup.py).
        import time as _t

        from sherpa_vietnamese_asr_tpu.pipeline.warmup import (
            warmup_programs,
        )

        t0 = _t.time()
        print("[serve] warmup: compiling decode + streaming programs...")
        warmup_programs(model_provider(None), models_dir=args.models_dir,
                        stages=("decode", "streaming", "diarization",
                                "punctuation"),
                        log=lambda m: print(f"[serve] {m}"),
                        streamer=_state.get_streamer())
        print(f"[serve] warmup done in {_t.time() - t0:.0f}s")
    scheme = "https" if getattr(_state, "tls_active", False) else "http"
    print(f"[serve] listening on {scheme}://{args.host}:"
          f"{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


def cmd_bench(args):
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    return 0


def cmd_warmup(args):
    """One-shot cache priming (pipeline/warmup.py): compile the flagship
    programs so the persistent compilation cache (utils/jax_setup.py) makes
    every later one-shot CLI run start at steady-state speed."""
    import time as _t

    from sherpa_vietnamese_asr_tpu.pipeline.warmup import (
        STAGES,
        warmup_programs,
    )

    stages = tuple(args.stages.split(",")) if args.stages else STAGES
    t0 = _t.time()
    model = _load_model(args)
    timings = warmup_programs(model, models_dir=args.models_dir,
                              stages=stages, jobs=args.jobs)
    done = [k for k, v in timings.items() if v is not None]
    print(f"[warmup] compiled {len(done)}/{len(timings)} stages "
          f"({', '.join(done)}) in {_t.time() - t0:.0f}s; programs are in "
          "the persistent cache.")
    return 0


def cmd_verify_assets(args):
    """Real-asset rehearsal (models/verify_assets.py): hash -> import ->
    JAX forward -> graph-executor cross-check -> token parity, per asset."""
    import json

    from sherpa_vietnamese_asr_tpu.models.verify_assets import (
        format_report,
        verify_assets,
    )

    keys = args.asset or None
    report = verify_assets(keys)
    if args.json:
        print(json.dumps(report, indent=2))
    else:
        print(format_report(report))
    return 0 if report["ok"] else 1


def cmd_install_service(args):
    """Write a systemd unit (reference service_installer.py installs a
    Windows service; this is the Linux/TPU-host analogue)."""
    import shutil

    unit = f"""[Unit]
Description=TPU Vietnamese ASR API server
After=network.target

[Service]
Type=simple
ExecStart={shutil.which("python3") or "/usr/bin/python3"} -m \
sherpa_vietnamese_asr_tpu.cli serve --host 0.0.0.0 --port {args.port} \
--data-dir {args.data_dir}
WorkingDirectory={__import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__)))}
Restart=on-failure
RestartSec=5

[Install]
WantedBy=multi-user.target
"""
    with open(args.output, "w") as f:
        f.write(unit)
    print(f"wrote {args.output}; install with:\n"
          f"  sudo cp {args.output} /etc/systemd/system/ && "
          "sudo systemctl enable --now svt-asr")
    return 0


def cmd_calibrate(args):
    from sherpa_vietnamese_asr_tpu.pipeline.calibration import (
        auto_batch_size, autotune_max_batch, run_device_calibration,
        run_full_pipeline_calibration,
    )

    report = run_device_calibration(progress_callback=print)
    if args.full:
        # Reference-style end-to-end compare: one real pipeline run per
        # backend on a 10-min sample (core/calibration.py:1395-1560).
        report["full_pipeline"] = run_full_pipeline_calibration(
            minutes=args.full_minutes,
            confidence_tol=args.confidence_tol,
            progress_callback=print)
    if args.autotune:
        # Reference batch autotune (core/calibration.py:968) + VRAM-aware
        # sizing (hardware_accel.py:639-678), retargeted to TPU HBM.
        cands = tuple(int(x) for x in args.candidates.split(","))
        tune = autotune_max_batch(candidates=cands, progress_callback=print)
        report["batch_autotune"] = tune
        report["recommended"] = {
            "max_batch": tune["best_batch"] or auto_batch_size("decode", 8),
            "embedding_batch": auto_batch_size("embedding", 16),
            "vibert_batch": auto_batch_size("vibert", 16),
            "campp_batch": auto_batch_size("campp", 32),
        }
    with open(args.output, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "stages"}))
    print(f"wrote {args.output}")
    return 0


def cmd_monitor(args):
    """RAM/CPU/disk sampler (reference resource_monitor.py equivalent)."""
    import csv
    import resource

    out = open(args.output, "w", newline="") if args.output else None
    writer = csv.writer(out) if out else None
    if writer:
        writer.writerow(["t", "rss_mb", "cpu_user_s", "cpu_sys_s"])
    t0 = time.time()
    try:
        for _ in range(args.samples):
            ru = resource.getrusage(resource.RUSAGE_SELF)
            rss_mb = ru.ru_maxrss / 1024
            row = [round(time.time() - t0, 1), round(rss_mb, 1),
                   round(ru.ru_utime, 2), round(ru.ru_stime, 2)]
            print(f"t={row[0]}s rss={row[1]}MB user={row[2]}s sys={row[3]}s")
            if writer:
                writer.writerow(row)
            time.sleep(args.interval)
    except KeyboardInterrupt:
        pass
    finally:
        if out:
            out.close()
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="svt", description="TPU-native Vietnamese ASR framework")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("transcribe", help="transcribe an audio file")
    t.add_argument("audio")
    t.add_argument("--model", default="zipformer-30m-rnnt-6000h",
                   help="model dir (with ONNX + tokens.txt) or model id")
    t.add_argument("--beam", type=int, default=8)
    t.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="encoder compute dtype; bfloat16 is ~2x faster on "
                        "TPU but transcripts are not bit-identical to fp32")
    t.add_argument("--rover", action="store_true")
    t.add_argument("--diarize", action="store_true")
    t.add_argument("--punctuate", action="store_true")
    t.add_argument("--quality", action="store_true",
                   help="DNSMOS audio-quality analysis")
    t.add_argument("--num-speakers", type=int, default=0)
    t.add_argument("--hotwords-file", default=None,
                   help="hotword phrases file (one per line, optional "
                        ":score suffix); needs bpe.model in the model dir")
    t.add_argument("--hotwords-score", type=float, default=1.5)
    t.add_argument("--max-batch", type=int, default=8)
    t.add_argument("--rms-normalize", action="store_true")
    t.add_argument("--wpe", action="store_true")
    t.add_argument("--no-vad", action="store_true")
    t.add_argument("--output", default=None)
    t.add_argument("--profile", default=None,
                   help="write a jax profiler trace to this directory")
    t.add_argument("--resume", dest="enable_resume", action="store_true",
                   help="resume from a .asr_ckpt.json if present")
    t.add_argument("--models-dir", default=None,
                   help="root of downloaded model assets "
                        "(default: $SVT_MODELS_DIR or ./models)")
    t.add_argument("--allow-random", action="store_true",
                   help="permit RANDOM-weight models when no checkpoint is "
                        "found (output is garbage; tests/benchmarks only)")
    t.add_argument("-v", "--verbose", action="store_true")
    t.set_defaults(fn=cmd_transcribe)

    s = sub.add_parser("serve", help="run the HTTP API server")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--data-dir", default="web_data")
    s.add_argument("--warmup", action="store_true",
                   help="compile decode + streaming programs before "
                        "accepting requests")
    s.add_argument("--http", action="store_true",
                   help="plain HTTP (default: TLS with a self-signed cert "
                        "unless server config sets http_mode=1)")
    s.add_argument("--models-dir", default=None)
    s.add_argument("--allow-random", action="store_true",
                   help="permit RANDOM-weight models (garbage output; "
                        "tests/benchmarks only)")
    s.set_defaults(fn=cmd_serve)

    b = sub.add_parser("bench", help="run the benchmark")
    b.set_defaults(fn=cmd_bench)

    w = sub.add_parser(
        "warmup",
        help="compile the flagship programs once (persistent cache "
             "priming: cold one-shot runs then start at steady speed)")
    w.add_argument("--model", default="zipformer-30m-rnnt-6000h")
    w.add_argument("--beam", type=int, default=8)
    # Default must match `svt transcribe` (compute_dtype is part of the
    # traced program): warming bfloat16 while transcribe defaults to
    # float32 would prime programs the first real run never hits.
    w.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    w.add_argument("--models-dir", default=None)
    w.add_argument("--allow-random", action="store_true",
                   help="warm with random weights when no checkpoints "
                        "exist (program shapes are weight-independent)")
    w.add_argument("--stages", default=None,
                   help="comma-separated subset of: decode,vad,streaming,"
                        "diarization,punctuation,quality,senko")
    w.add_argument("--jobs", type=int, default=4,
                   help="stages compiled concurrently (the compile "
                        "service accepts parallel requests; 4 halves a "
                        "cleared-cache warmup). 1 = sequential")
    w.set_defaults(fn=cmd_warmup)

    va = sub.add_parser(
        "verify-assets",
        help="verify downloaded checkpoints: pinned hashes, importer "
             "mapping, JAX forward, first-party graph-executor "
             "cross-check, decode token parity")
    va.add_argument("--asset", action="append",
                    help="restrict to one asset key (repeatable); "
                         "default: all")
    va.add_argument("--json", action="store_true")
    va.set_defaults(fn=cmd_verify_assets)

    sv = sub.add_parser("install-service",
                        help="write a systemd unit for the API server "
                             "(reference service_installer.py analogue)")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--data-dir", default="/var/lib/svt-asr")
    sv.add_argument("--output", default="svt-asr.service")
    sv.set_defaults(fn=cmd_install_service)

    c = sub.add_parser("calibrate", help="device calibration report")
    c.add_argument("--output", default="calibration_report.json")
    c.add_argument("--autotune", action="store_true",
                   help="probe decode batch sizes and emit recommended "
                        "max_batch per stage")
    c.add_argument("--candidates", default="8,16,32,48,64,96",
                   help="comma-separated batch sizes to probe (each costs "
                        "a one-time compile of the decode program)")
    c.add_argument("--full", action="store_true",
                   help="also run the full pipeline once per backend on a "
                        "synthetic 10-min sample and compare wall/stage "
                        "speedups + output parity (reference "
                        "core/calibration.py:1395-1560)")
    c.add_argument("--full-minutes", type=float, default=10.0)
    c.add_argument("--confidence-tol", type=float, default=1e-4,
                   help="asr_confidence parity gate (reference default "
                        "1e-4; widen for random-weight rehearsals)")
    c.set_defaults(fn=cmd_calibrate)

    m = sub.add_parser("monitor", help="resource monitor")
    m.add_argument("--interval", type=float, default=1.0)
    m.add_argument("--samples", type=int, default=60)
    m.add_argument("--output", default=None)
    m.set_defaults(fn=cmd_monitor)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
