"""Time pure-python vs native (PIL) image decode over the committed
fixture corpus — the bench rung for the media fast path.

The engine's decode boundary is `images.decode_image`: it prefers PIL
when installed (the native fast path; the plan — mapInPandas over
binary columns — is unchanged by construction) and falls back to the
pure-python codecs that serve as the correctness reference.
test_multimodal's env-gated equality test pins fast == pure on every
fixture; this tool quantifies the speed gap so the README's claim
("the pure-python decode interior is the honest bottleneck at real
media scale") is a measured number, not prose.

Prints one JSON line:
  {"files": N, "pure_s": ..., "pil_s": ...|null, "speedup": ...|null}

PIL-less boxes (this container) report pure_s only.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal import images as M  # noqa: E402

REPS = int(os.environ.get("DECODE_BENCH_REPS", "5"))

MEDIA_TYPES = {
    ".png": "image/png", ".jpg": "image/jpeg", ".gif": "image/gif",
    ".bmp": "image/bmp", ".tif": "image/tiff", ".webp": "image/webp",
    ".ico": "image/ico",
}


def corpus() -> list[tuple[bytes, str]]:
    fix_root = os.path.join(os.path.dirname(M.__file__), "fixtures")
    out = []
    for pattern in ("*", "neardup/*", "modern/*", "foreign/*", "archival/*", "apng/*", "ico/*", "lossy_webp/*", "alpha_webp/*", "anim_webp/*"):
        for path in sorted(glob.glob(os.path.join(fix_root, pattern))):
            mt = MEDIA_TYPES.get(os.path.splitext(path)[1])
            if mt:
                out.append((open(path, "rb").read(), mt))
    return out


def main() -> None:
    files = corpus()
    # warm both paths once (imports, numpy JIT-ish caches)
    for payload, mt in files:
        M.decode_image_pure(payload, mt)

    t0 = time.perf_counter()
    for _ in range(REPS):
        for payload, mt in files:
            M.decode_image_pure(payload, mt)
    pure_s = round((time.perf_counter() - t0) / REPS, 3)

    # per-format pure timings (the honest "which codec is the
    # bottleneck" breakdown the README cites)
    per_format: dict[str, float] = {}
    for fmt in sorted({mt for _, mt in files}):
        sub = [(p, mt) for p, mt in files if mt == fmt]
        t0 = time.perf_counter()
        for _ in range(REPS):
            for payload, mt in sub:
                M.decode_image_pure(payload, mt)
        per_format[f"{fmt} ({len(sub)})"] = round(
            (time.perf_counter() - t0) / REPS, 3
        )

    # native lane for LOSSY webp: the system libwebp via ctypes
    # (webp_native) — available even on PIL-less boxes like this
    # container, so the fast-vs-pure gap is a committed number
    from a3_fp_bigdata_spark.multimodal import webp_native as W

    native_webp_s = None
    pure_webp_s = None
    if W.HAVE_LIBWEBP:
        lossy = [
            (p, mt) for p, mt in files
            if mt == "image/webp" and b"VP8 " in p[:24]
        ]
        if lossy:
            for payload, _ in lossy:
                W.decode_rgb_via_yuv(payload)
            t0 = time.perf_counter()
            for _ in range(REPS):
                for payload, _ in lossy:
                    W.decode_rgb_via_yuv(payload)
            native_webp_s = round((time.perf_counter() - t0) / REPS, 4)
            t0 = time.perf_counter()
            for _ in range(REPS):
                for payload, mt in lossy:
                    M.decode_image_pure(payload, mt)
            pure_webp_s = round((time.perf_counter() - t0) / REPS, 4)

    pil_s = None
    if M.HAVE_PIL:
        for payload, mt in files:
            M.decode_image(payload, mt)
        t0 = time.perf_counter()
        for _ in range(REPS):
            for payload, mt in files:
                M.decode_image(payload, mt)
        pil_s = round((time.perf_counter() - t0) / REPS, 3)

    print(
        json.dumps(
            {
                "files": len(files),
                "reps": REPS,
                "pure_s": pure_s,
                "pil_s": pil_s,
                "speedup": (
                    round(pure_s / pil_s, 1) if pil_s else None
                ),
                "per_format_pure_s": per_format,
                "lossy_webp_pure_s": pure_webp_s,
                "lossy_webp_native_s": native_webp_s,
                "lossy_webp_native_speedup": (
                    round(pure_webp_s / native_webp_s, 1)
                    if native_webp_s
                    else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
