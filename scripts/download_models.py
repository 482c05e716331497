#!/usr/bin/env python3
# Model checkpoint downloader with pinned revisions — the counterpart of the
# reference's build-portable/prepare_offline_build.py (pinned-SHA256 model
# downloads). This environment has no network egress; the script verifies
# SHA256 when files are already present and prints exact fetch commands
# otherwise.

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sherpa_vietnamese_asr_tpu.utils.config import MODEL_DOWNLOAD_INFO

# SHA256 pins are filled in when checkpoints are first fetched/verified;
# empty means "not yet pinned" (print-and-skip).
SHA256_PINS: dict[str, dict[str, str]] = {name: {} for name in
                                          MODEL_DOWNLOAD_INFO}


def sha256_file(path, chunk=1 << 20):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models-dir", default="models")
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args()

    missing = 0
    for model_id, info in MODEL_DOWNLOAD_INFO.items():
        model_dir = os.path.join(args.models_dir, model_id)
        for fname in info["files"] + ["tokens.txt", "bpe.model"]:
            path = os.path.join(model_dir, fname)
            pin = SHA256_PINS.get(model_id, {}).get(fname)
            if os.path.exists(path):
                digest = sha256_file(path)
                if pin and digest != pin:
                    print(f"[FAIL] {path}: sha256 {digest} != pinned {pin}")
                    missing += 1
                else:
                    print(f"[ok]   {path} sha256={digest[:16]}…")
            else:
                missing += 1
                print(f"[MISS] {path}")
                print(f"       fetch: {info['hf_url']}/resolve/main/{fname}")
    if missing:
        print(f"\n{missing} files missing/invalid. This environment has no "
              "network egress; fetch on a connected host and copy into "
              f"{args.models_dir}/.")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
