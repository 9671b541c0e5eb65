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


def ctc_beam_decode(
    logits: np.ndarray,
    seq_len: int | None = None,
    beam_width: int = 8,
    bigram_log_prior: np.ndarray | None = None,
    prior_weight: float = 1.0,
) -> str:
    """Top-1 of ``ctc_beam_decode_nbest`` (see there for semantics)."""
    nbest = ctc_beam_decode_nbest(
        logits, seq_len, beam_width, bigram_log_prior, prior_weight
    )
    return decode_indices(list(nbest[0][0])) if nbest else ""


def ctc_beam_decode_nbest(
    logits: np.ndarray,
    seq_len: int | None = None,
    beam_width: int = 8,
    bigram_log_prior: np.ndarray | None = None,
    prior_weight: float = 1.0,
) -> list[tuple[tuple[int, ...], float]]:
    """CTC prefix beam search over one line's logits ``[T, C]`` → the
    final beam as ``[(label_indices, log_prob), ...]``, best first (ties
    lexicographic). The N-best surface exists for backward-context
    rescoring (``kernels.font`` ``decoder="beam_bi"``): a second pass may
    re-rank complete hypotheses with information unavailable during the
    left-to-right search.

    The published prefix-search decoder (Graves 2006 §7.5 / the standard
    prefix-beam formulation): per prefix, track the probability of ending
    in blank vs. ending in its last symbol, extend with every class, keep
    the ``beam_width`` best prefixes by total probability. Sums
    probability over ALL alignments of a labeling, which greedy cannot —
    when the per-frame mass splits across alignments of the same string,
    beam recovers the string greedy drops. Logits are softmax-normalized
    per frame; ``merge_repeated`` semantics match the greedy decoder and
    the reference (repeat emission requires an intervening blank).
    Deterministic: ties break lexicographically on the prefix.

    ``bigram_log_prior``: optional ``[C+1, C]`` log-prior fused at every
    NEW-symbol emission — row ``prev`` (``C`` = start-of-line) scores the
    next symbol given the previously emitted one. This is the engine's
    fixed-weight analog of the reference's BiLSTM context
    (``/root/reference/Module/RecognitionBackbone.py:77-123``): per-frame
    evidence alone cannot tell O from 0 or l from 1 under heavy noise,
    cross-symbol context can. Shallow-fusion weight ``prior_weight``.
    """
    logits = np.asarray(logits, dtype=np.float64)
    if logits.ndim != 2:
        raise ValueError(f"expected [T, C] logits, got shape {logits.shape}")
    if seq_len is not None:
        logits = logits[:seq_len]
    T, C = logits.shape
    if T == 0:
        return [((), 0.0)]
    # per-frame softmax (shift for stability)
    z = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(z)
    probs /= probs.sum(axis=1, keepdims=True)
    prior = None
    if bigram_log_prior is not None:
        prior = np.exp(np.asarray(bigram_log_prior, dtype=np.float64)
                       * float(prior_weight))
        if prior.shape != (C + 1, C):
            raise ValueError(
                f"bigram prior must be [{C + 1}, {C}], got {prior.shape}"
            )

    # beams: prefix tuple -> (p_blank, p_non_blank)
    beams: dict[tuple[int, ...], tuple[float, float]] = {(): (1.0, 0.0)}
    for t in range(T):
        frame = probs[t]
        nxt: dict[tuple[int, ...], list[float]] = {}

        def add(prefix, pb, pnb):
            cur = nxt.setdefault(prefix, [0.0, 0.0])
            cur[0] += pb
            cur[1] += pnb

        for prefix, (pb, pnb) in beams.items():
            total = pb + pnb
            # extend with blank: prefix unchanged, now blank-terminated
            add(prefix, total * frame[BLANK_INDEX], 0.0)
            # repeat last symbol without blank: stays the same labeling
            if prefix:
                add(prefix, 0.0, pnb * frame[prefix[-1]])
            prow = (
                prior[prefix[-1] if prefix else C] if prior is not None
                else None
            )
            for c in range(C):
                if c == BLANK_INDEX:
                    continue
                p_c = frame[c]
                if p_c < 1e-9:
                    continue
                if prow is not None:
                    p_c = p_c * prow[c]
                if prefix and prefix[-1] == c:
                    # extend same symbol: only from the blank-ended mass
                    add(prefix + (c,), 0.0, pb * p_c)
                else:
                    add(prefix + (c,), 0.0, total * p_c)
        ranked = sorted(
            nxt.items(), key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0])
        )[:beam_width]
        beams = {k: (v[0], v[1]) for k, v in ranked}
    # ties break toward the lexicographically SMALLEST prefix — the same
    # order the per-step pruning uses
    ranked_final = sorted(
        beams.items(), key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0])
    )
    tiny = np.finfo(np.float64).tiny
    return [
        (prefix, float(np.log(max(pb + pnb, tiny))))
        for prefix, (pb, pnb) in ranked_final
    ]


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
