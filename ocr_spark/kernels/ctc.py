"""CTC greedy decode + charset codec.

Reproduces the reference decode semantics exactly:

* greedy decoder with ``merge_repeated=True``
  (``/root/reference/Module/RecognitionLoss.py:33-38``) — per-timestep
  argmax, collapse consecutive repeats, drop the blank class;
* blank class is index 94 (``/root/reference/config.py:2-6``);
* index→char mapping through ``CHAR_VECTOR``
  (``/root/reference/test_img.py:19-27`` — note that function's
  ``if i == 94`` positional quirk is a reference bug; the blank never
  reaches it because the TF decoder already dropped blanks, so the clean
  semantics implemented here match observable reference output);
* char→index encoding skips characters not in the vocabulary
  (``/root/reference/DataPreprocess/DataGen.py:28-45``).
"""

from __future__ import annotations

import numpy as np

from ocr_spark.config import BLANK_INDEX, CHAR_VECTOR

_CHAR_TO_IDX = {c: i for i, c in enumerate(CHAR_VECTOR)}


def encode_text(text: str) -> list[int]:
    """Map a string to class indices, skipping out-of-vocabulary chars."""
    return [_CHAR_TO_IDX[c] for c in text if c in _CHAR_TO_IDX]


def decode_indices(indices: np.ndarray | list[int]) -> str:
    """Map class indices (already blank/repeat-free) to a string.

    ``-1`` entries (the reference's sparse→dense fill,
    ``/root/reference/Module/RecognitionLoss.py:37``) are skipped.
    """
    out = []
    for i in indices:
        if 0 <= i < len(CHAR_VECTOR):
            out.append(CHAR_VECTOR[i])
    return "".join(out)


def ctc_greedy_decode(logits: np.ndarray, seq_len: int | None = None) -> str:
    """Greedy CTC decode of one line's logits ``[T, NUM_CLASSES]`` → text.

    argmax per timestep → collapse consecutive repeats → drop blank(94) →
    map through CHAR_VECTOR.
    """
    logits = np.asarray(logits)
    if logits.ndim != 2:
        raise ValueError(f"expected [T, C] logits, got shape {logits.shape}")
    if seq_len is not None:
        logits = logits[:seq_len]
    if logits.shape[0] == 0:
        return ""
    best = logits.argmax(axis=1)
    # collapse consecutive repeats (merge_repeated=True)
    keep = np.ones(best.shape[0], dtype=bool)
    keep[1:] = best[1:] != best[:-1]
    collapsed = best[keep]
    collapsed = collapsed[collapsed != BLANK_INDEX]
    return decode_indices(collapsed)


def ctc_greedy_decode_batch(
    logits_batch: np.ndarray, seq_lens: np.ndarray | None = None
) -> list[str]:
    """Vectorized batch decode of ``[B, T, NUM_CLASSES]`` logits.

    The argmax over the whole batch is a single NumPy reduction; only the
    variable-length collapse is per-row (tiny: over T ≤ 384 ints). This is
    the Arrow-UDF interior — the batch dimension is the Arrow batch.
    """
    logits_batch = np.asarray(logits_batch)
    if logits_batch.ndim != 3:
        raise ValueError(f"expected [B, T, C], got {logits_batch.shape}")
    best = logits_batch.argmax(axis=2)  # [B, T]
    out: list[str] = []
    for b in range(best.shape[0]):
        row = best[b]
        if seq_lens is not None:
            row = row[: int(seq_lens[b])]
        if row.size == 0:
            out.append("")
            continue
        keep = np.ones(row.shape[0], dtype=bool)
        keep[1:] = row[1:] != row[:-1]
        collapsed = row[keep]
        collapsed = collapsed[collapsed != BLANK_INDEX]
        out.append(decode_indices(collapsed))
    return out
