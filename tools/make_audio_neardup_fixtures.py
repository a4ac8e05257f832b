"""Generate the committed audio NEAR-DUP fixture set (mm9).

Deterministic WAV clips (fixed-seed generator) in
`multimodal/fixtures/audio_neardup/`: six distinct base clips plus
PLANTED perturbed twins — the ground truth an audio-dedup rung must
recover:

| twin | perturbation | why it must pair |
|---|---|---|
| ad_<b>_gain.wav   | all samples x 0.45 | envelope gradient SIGNS are scale-invariant |
| ad_<b>_resamp.wav | linear-interp resample 8 kHz -> 16 kHz | eHash windows are clip FRACTIONS, not sample counts |
| ad_<b>_noise.wav  | + seeded uniform noise at 0.4% FS | window contrasts (>= 0.15) dwarf the noise floor |
| ad_<b>_copy.wav   | identical bytes, new filename | exact dup under a different media_id |

Each base is a sine carrier whose amplitude follows 65 piecewise-
constant levels aligned to the eHash window boundaries, with every
adjacent-level step >= MIN_STEP — so the 64 gradient bits are decided
by construction, not by carrier phase accidents, and the planted
perturbations can only flip bits if they rival MIN_STEP (they are an
order of magnitude below it).

The generator VERIFIES the margins before writing anything: every
planted pair's eHash distance must be <= the engine's pairing radius
(AUDIO_NEARDUP_MAX_HAMMING), every non-planted pair's must exceed
NEGATIVE_MARGIN — so the recorded expected-pair list derives from the
construction, and a future hash change that weakens separation fails
HERE, not in a flaky test. Prints the pinned pair list for
tests/test_multimodal.py.

Usage: python tools/make_audio_neardup_fixtures.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal.audio import decode_wav, encode_wav
from a3_fp_bigdata_spark.multimodal.audio_fp import (
    _N_WINDOWS,
    AUDIO_NEARDUP_FIXTURE_DIR,
    AUDIO_NEARDUP_MAX_HAMMING,
    envelope_hash64,
)

NEGATIVE_MARGIN = 14  # non-planted pairs must be at least this far
MIN_STEP = 0.15  # adjacent envelope levels differ by at least this
SR = 8000
SAMPLES_PER_WINDOW = 160  # 20 ms windows -> 1.3 s clips
N = _N_WINDOWS * SAMPLES_PER_WINDOW


def make_levels(rng: np.random.Generator) -> np.ndarray:
    """65 amplitude levels in [0.10, 0.95], each >= MIN_STEP from its
    predecessor — REJECTION sampling (resample until the step clears;
    acceptance ≈ 0.65 per draw), bounded below so a pathological seed
    fails loudly instead of spinning forever."""
    levels = [float(rng.uniform(0.10, 0.95))]
    draws = 0
    while len(levels) < _N_WINDOWS:
        cand = float(rng.uniform(0.10, 0.95))
        draws += 1
        assert draws < 100_000, "rejection loop not converging"
        if abs(cand - levels[-1]) >= MIN_STEP:
            levels.append(cand)
    return np.array(levels)


def synth(levels: np.ndarray, freq: float) -> np.ndarray:
    """Sine carrier at `freq` with a 65-level piecewise envelope, one
    level per eHash window (boundaries coincide by construction: N is
    an exact multiple of _N_WINDOWS)."""
    env = np.repeat(levels, SAMPLES_PER_WINDOW)
    t = np.arange(N) / SR
    return (env * np.sin(2 * np.pi * freq * t)).reshape(-1, 1)


def make_clip(seed: int, freq: float) -> np.ndarray:
    return synth(make_levels(np.random.default_rng(seed)), freq)


def resample_linear(x: np.ndarray, factor: int) -> np.ndarray:
    """Exact-fraction linear-interp upsample (n -> n*factor)."""
    n = x.shape[0]
    src = np.arange(n * factor) / factor
    i0 = np.minimum(src.astype(np.int64), n - 1)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = (src - i0)[:, None]
    return x[i0] * (1 - frac) + x[i1] * frac


BASES = {
    "ad_walk1": (101, 330.0),
    "ad_walk2": (202, 440.0),
    "ad_walk3": (303, 550.0),
    "ad_walk4": (404, 660.0),
    "ad_walk5": (505, 770.0),
    "ad_walk6": (606, 880.0),
}

clips: dict[str, tuple[np.ndarray, int]] = {
    name: (make_clip(seed, freq), SR) for name, (seed, freq) in BASES.items()
}

# planted twins (construction IS the ground truth)
noise_rng = np.random.default_rng(777)
clips["ad_walk1_gain"] = (clips["ad_walk1"][0] * 0.45, SR)
clips["ad_walk2_resamp"] = (resample_linear(clips["ad_walk2"][0], 2), 2 * SR)
clips["ad_walk3_noise"] = (
    np.clip(
        clips["ad_walk3"][0]
        + noise_rng.uniform(-0.004, 0.004, (N, 1)),
        -1.0,
        1.0,
    ),
    SR,
)
# ad_walk4_copy: identical BYTES, new filename (written below)
# ad_walk5_var: SWAP two isolated adjacent level pairs (10<->11,
# 30<->31). Each swap definitely flips its inner gradient bit and can
# flip at most its two boundary bits, so the distance is pinned to
# [2, 6] by construction — nonzero, inside radius 7: this is the twin
# that exercises the RADIUS, not just distance 0 (the image set's
# lossy-JPEG analog).
_l5 = make_levels(np.random.default_rng(BASES["ad_walk5"][0]))
_l5v = _l5.copy()
_l5v[[10, 11]] = _l5v[[11, 10]]
_l5v[[30, 31]] = _l5v[[31, 30]]
clips["ad_walk5_var"] = (synth(_l5v, BASES["ad_walk5"][1]), SR)

PLANTED = {
    frozenset({"ad_walk1", "ad_walk1_gain"}),
    frozenset({"ad_walk2", "ad_walk2_resamp"}),
    frozenset({"ad_walk3", "ad_walk3_noise"}),
    frozenset({"ad_walk4", "ad_walk4_copy"}),
    frozenset({"ad_walk5", "ad_walk5_var"}),
}

# ---- encode, then hash the DECODE (what mm9 will actually see) ----------
payloads: dict[str, bytes] = {
    name: encode_wav(x, sr) for name, (x, sr) in clips.items()
}
payloads["ad_walk4_copy"] = payloads["ad_walk4"]

hashes = {
    name: envelope_hash64(decode_wav(p)[0]) for name, p in payloads.items()
}

# ---- margin verification BEFORE writing ---------------------------------
names = sorted(payloads)
violations = []
pairs_within = []
for i, a in enumerate(names):
    for b in names[i + 1 :]:
        d = bin(
            (hashes[a] & (2**64 - 1)) ^ (hashes[b] & (2**64 - 1))
        ).count("1")
        planted = frozenset({a, b}) in PLANTED
        if planted and d > AUDIO_NEARDUP_MAX_HAMMING:
            violations.append(f"planted pair {a}/{b} too far: {d}")
        if not planted and d < NEGATIVE_MARGIN:
            violations.append(f"negative pair {a}/{b} too close: {d}")
        if d <= AUDIO_NEARDUP_MAX_HAMMING:
            pairs_within.append((a, b, d))
assert not violations, "\n".join(violations)
assert {frozenset({a, b}) for a, b, _ in pairs_within} == PLANTED

# ---- write ---------------------------------------------------------------
os.makedirs(AUDIO_NEARDUP_FIXTURE_DIR, exist_ok=True)
for name, payload in payloads.items():
    path = os.path.join(AUDIO_NEARDUP_FIXTURE_DIR, f"{name}.wav")
    with open(path, "wb") as fh:
        fh.write(payload)
    print(f"wrote {path} ({len(payload)} bytes)")

print("\npinned planted pairs (filename_a, filename_b, hamming):")
for a, b, d in sorted(pairs_within):
    print(f"  ({a!r}, {b!r}, {d})")
