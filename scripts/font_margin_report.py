"""Offline margin report for the 94-glyph font atlas.

Run after any glyph/atlas change:

    PYTHONPATH=/root/repo python scripts/font_margin_report.py

Reports (1) the worst template cross-correlations (confusable pairs),
(2) exact-recognition rate over noisy distorted renders of every
vocabulary character in random contexts at the contract operating point
(2x bilinear upscale, sigma=0.1), and (3) the blank-margin statistics
that justify ``BLANK_TAU``.
"""

from __future__ import annotations

import sys

import numpy as np

from ocr_spark.config import CHAR_VECTOR
from ocr_spark.kernels.font import (
    _ATLAS_IDX,
    _ATLAS_T,
    _N_VARIANTS,
    BLANK_TAU,
    FONT_CHARS,
    recognize_lines_font,
    render_distorted_line,
)


def template_confusions(top: int = 15) -> list[tuple[str, str, float]]:
    """Max NCC between any variant of char a and any variant of char b."""
    n = len(FONT_CHARS)
    t = _ATLAS_T.reshape(_N_VARIANTS, n, -1)
    worst: dict[tuple[str, str], float] = {}
    for va in range(_N_VARIANTS):
        for vb in range(_N_VARIANTS):
            sim = t[va] @ t[vb].T
            for i in range(n):
                for j in range(i + 1, n):
                    key = (FONT_CHARS[i], FONT_CHARS[j])
                    v = float(sim[i, j])
                    if v > worst.get(key, -2.0):
                        worst[key] = v
    pairs = sorted(worst.items(), key=lambda kv: -kv[1])[:top]
    return [(a, b, v) for (a, b), v in pairs]


def noisy_roundtrip(n_lines: int = 400, line_len: int = 30, seed0: int = 0):
    rng = np.random.default_rng(12345)
    vocab = list(CHAR_VECTOR)
    errors: dict[tuple[str, str], int] = {}
    n_ok = 0
    for i in range(n_lines):
        # every line mixes alnum + punctuation; no adjacent repeats so a
        # single strip always suffices at this length
        chars = []
        while len(chars) < line_len:
            c = vocab[int(rng.integers(len(vocab)))]
            if chars and chars[-1] == c:
                continue
            chars.append(c)
        text = "".join(chars)
        strip, width = render_distorted_line(
            text, scale=2.0, sigma=0.1, seed=seed0 + i
        )
        got = recognize_lines_font(strip[None], [width])[0]
        if got == text:
            n_ok += 1
        else:
            for a, b in zip(text, got):
                if a != b:
                    errors[(a, b)] = errors.get((a, b), 0) + 1
            if len(got) != len(text):
                errors[("<len>", f"{len(text)}->{len(got)}")] = (
                    errors.get(("<len>", f"{len(text)}->{len(got)}"), 0) + 1
                )
    return n_ok, n_lines, errors


def blank_margins(n: int = 200):
    """Worst glyph-window NCC score vs best noise-window score."""
    from ocr_spark.kernels.font import font_line_logits, GLYPH_W

    worst_glyph, best_blank = 2.0, -2.0
    rng = np.random.default_rng(999)
    for i in range(n):
        text = "".join(
            CHAR_VECTOR[int(rng.integers(len(CHAR_VECTOR)))] for _ in range(20)
        )
        text = "".join(
            c for j, c in enumerate(text) if j == 0 or text[j - 1] != c
        )
        strip, width = render_distorted_line(text, 2.0, 0.1, seed=5000 + i)
        lg = font_line_logits(strip[None])[0]
        t_used = width // GLYPH_W
        scores = lg[:, :-1].max(axis=1)
        if t_used:
            worst_glyph = min(worst_glyph, float(scores[:t_used].min()))
        if t_used < scores.shape[0]:
            best_blank = max(best_blank, float(scores[t_used:].max()))
    return worst_glyph, best_blank


if __name__ == "__main__":
    print(f"atlas chars: {len(FONT_CHARS)} / vocab {len(CHAR_VECTOR)}")
    missing = [c for c in CHAR_VECTOR if c not in FONT_CHARS]
    if missing:
        print("MISSING GLYPHS:", "".join(missing))
    print("\nworst template cross-correlations:")
    for a, b, v in template_confusions():
        print(f"  {a!r} vs {b!r}: {v:.3f}")
    ok, total, errors = noisy_roundtrip()
    print(f"\nnoisy roundtrip exact: {ok}/{total}")
    if errors:
        for (a, b), c in sorted(errors.items(), key=lambda kv: -kv[1])[:20]:
            print(f"  {a!r} -> {b!r}: {c}")
    wg, bb = blank_margins()
    print(f"\nglyph-window min score {wg:.3f} | noise-window max {bb:.3f} "
          f"| BLANK_TAU {BLANK_TAU}")
    sys.exit(0 if ok == total and not missing else 1)
