"""Regenerate the committed WAV fixtures under multimodal/fixtures/.

Deterministic waveforms -> audio.encode_wav (stdlib wave, 16-bit PCM).
Known analytic properties let tests pin exact features:
- sine amplitude A -> RMS ~= A/sqrt(2), peak ~= A
- silence -> RMS = 0, peak = 0
- square wave amplitude A -> RMS ~= A, peak ~= A
Run from the repo root: python tools/make_wav_fixtures.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal.audio import (
    FIXTURE_DIR,
    decode_wav,
    encode_wav,
)

SR = 8000


def sine(freq: float, amp: float, secs: float) -> np.ndarray:
    t = np.arange(int(SR * secs)) / SR
    return amp * np.sin(2 * np.pi * freq * t)


FIXTURES = {
    "tone_440.wav": lambda: encode_wav(sine(440, 0.5, 1.0), SR),
    "silence.wav": lambda: encode_wav(np.zeros(SR // 2), SR),
    "square_220.wav": lambda: encode_wav(
        0.25 * np.sign(sine(220, 1.0, 0.75)), SR
    ),
}


def main() -> None:
    for name, build in FIXTURES.items():
        payload = build()
        with open(os.path.join(FIXTURE_DIR, name), "w+b") as fh:
            fh.write(payload)
        x, sr = decode_wav(payload)
        print(
            f"{name}: {len(payload)} bytes, {x.shape[0]/sr:.3f}s @ {sr}Hz, "
            f"rms={np.sqrt((x**2).mean()):.6f}, peak={np.abs(x).max():.6f}"
        )


if __name__ == "__main__":
    main()
