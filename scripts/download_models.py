#!/usr/bin/env python3
# Model checkpoint downloader/verifier with pinned SHA256 identities — the
# counterpart of the reference's build-portable/prepare_offline_build.py
# (:21-242). The manifest lives in sherpa_vietnamese_asr_tpu/models/assets.py
# (source repo@revision + per-file SHA256 for every asset).
#
# Modes:
#   verify (default when files exist): hash every present file against pins
#   download (--download): fetch missing files over HTTPS (HF resolve URLs /
#       direct URLs); refuses to keep a file whose hash mismatches
#
# In an egress-free environment the script prints exact fetch commands.

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sherpa_vietnamese_asr_tpu.models.assets import (  # noqa: E402
    MANIFEST, sha256_file,
)


def fetch_url(spec_source: str, fname: str) -> str | None:
    """Best-effort fetch URL from the manifest's source string."""
    if spec_source.startswith("hf:"):
        repo_rev = spec_source[3:].split(" ")[0]
        if "@" in repo_rev:
            repo, rev = repo_rev.split("@", 1)
        else:
            repo, rev = repo_rev, "main"
        return f"https://huggingface.co/{repo}/resolve/{rev}/{fname}"
    if "snakers4/silero-vad" in spec_source:
        return ("https://raw.githubusercontent.com/snakers4/silero-vad/"
                f"master/src/silero_vad/data/{fname}")
    if "microsoft/DNS-Challenge" in spec_source:
        return ("https://github.com/microsoft/DNS-Challenge/raw/master/"
                f"DNSMOS/DNSMOS/{fname}")
    return None


def download(url: str, dest: str) -> bool:
    import urllib.request
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    try:
        print(f"       fetching {url}")
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, dest)
        return True
    except Exception as e:  # no egress, 404, ...
        print(f"       fetch failed: {e}")
        if os.path.exists(tmp):
            os.remove(tmp)
        return False


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models-dir",
                    default=os.environ.get("SVT_MODELS_DIR", "models"))
    ap.add_argument("--download", action="store_true",
                    help="fetch missing files (needs network egress)")
    ap.add_argument("--only", default=None,
                    help="restrict to one asset key (e.g. zipformer-30m)")
    args = ap.parse_args()

    bad = missing = ok = 0
    for key, spec in MANIFEST.items():
        if args.only and key != args.only:
            continue
        root = os.path.join(args.models_dir, spec["local_dir"])
        for fname, pin in spec["files"].items():
            path = os.path.join(root, fname)
            if not os.path.exists(path) and args.download:
                url = fetch_url(spec["source"], fname)
                if url:
                    download(url, path)
            if os.path.exists(path):
                digest = sha256_file(path)
                if pin and digest != pin:
                    bad += 1
                    print(f"[FAIL] {path}\n       sha256 {digest}\n"
                          f"       pinned {pin}")
                    if args.download:
                        os.remove(path)
                        print("       removed corrupt file")
                else:
                    ok += 1
                    print(f"[ok]   {path} sha256={digest[:16]}…")
            else:
                missing += 1
                url = fetch_url(spec["source"], fname)
                print(f"[MISS] {path}")
                if url:
                    print(f"       fetch: {url}")
    print(f"\n{ok} verified, {missing} missing, {bad} corrupt.")
    if missing and not args.download:
        print("Run with --download on a connected host, or copy assets "
              f"into {args.models_dir}/ and re-run to verify.")
    return 1 if (missing or bad) else 0


if __name__ == "__main__":
    sys.exit(main())
