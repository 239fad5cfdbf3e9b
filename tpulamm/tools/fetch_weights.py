"""Model weights fetcher (reference model_weights/llama_weights_download.py).

Downloads a GGUF (or an HF repo snapshot for tools/convert_hf.py) over
plain HTTPS — no hub SDK required — with resume support and size checks.

    python -m tpulamm.tools.fetch_weights \
        --url https://huggingface.co/<org>/<repo>/resolve/main/model.gguf \
        -o models/model.gguf
    python -m tpulamm.tools.fetch_weights --hf TinyLlama/TinyLlama-1.1B \
        --files config.json model.safetensors -o models/tinyllama/

Offline environments fail fast with a clear message (the rest of the
framework never needs network: GGUF in, tokens out).
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.error
import urllib.request

CHUNK = 1 << 20


def download(url: str, out_path: str, quiet: bool = False) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = out_path + ".part"
    start = os.path.getsize(tmp) if os.path.exists(tmp) else 0
    req = urllib.request.Request(url)
    if start:
        req.add_header("Range", f"bytes={start}-")
    try:
        resp = urllib.request.urlopen(req, timeout=30)
    except urllib.error.HTTPError as e:
        if e.code == 416 and start:
            # Range past EOF: the .part already holds the whole file
            os.replace(tmp, out_path)
            return out_path
        raise SystemExit(f"HTTP {e.code} fetching {url}: {e.reason}")
    except (urllib.error.URLError, OSError) as e:
        raise SystemExit(
            f"cannot reach {url}: {e}\n"
            "(offline environment? place the GGUF file locally instead — "
            "every tpulamm tool takes a local -m path)")
    mode = "ab" if start and resp.status == 206 else "wb"
    total = int(resp.headers.get("Content-Length", 0)) + \
        (start if mode == "ab" else 0)
    done = start if mode == "ab" else 0
    with open(tmp, mode) as f:
        while True:
            buf = resp.read(CHUNK)
            if not buf:
                break
            f.write(buf)
            done += len(buf)
            if not quiet and total:
                pct = 100.0 * done / total
                print(f"\r{out_path}: {done / 1e6:.0f}/{total / 1e6:.0f} MB "
                      f"({pct:.1f}%)", end="", file=sys.stderr)
    if not quiet:
        print(file=sys.stderr)
    if total and done != total:
        raise SystemExit(f"size mismatch: got {done}, expected {total} "
                         f"(partial file kept at {tmp}; re-run to resume)")
    os.replace(tmp, out_path)
    return out_path


def hf_url(repo: str, filename: str, revision: str = "main") -> str:
    return (f"https://huggingface.co/{repo}/resolve/{revision}/{filename}"
            "?download=true")


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpulamm-fetch-weights")
    p.add_argument("--url", help="direct file URL")
    p.add_argument("--hf", metavar="ORG/REPO",
                   help="huggingface repo (use with --files)")
    p.add_argument("--files", nargs="*", default=["config.json"],
                   help="files to fetch from the --hf repo")
    p.add_argument("--revision", default="main")
    p.add_argument("-o", "--output", required=True,
                   help="output file (--url) or directory (--hf)")
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args(argv)
    if bool(args.url) == bool(args.hf):
        p.error("pass exactly one of --url / --hf")
    if args.url:
        download(args.url, args.output, quiet=args.quiet)
    else:
        for f in args.files:
            download(hf_url(args.hf, f, args.revision),
                     os.path.join(args.output, f), quiet=args.quiet)
    return 0


if __name__ == "__main__":
    sys.exit(main())
