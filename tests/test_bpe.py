"""BPE trainer semantics: the incremental merge loop is pinned against a
naive recompute-from-scratch reference, encode_word is pinned against a
rank-order merge replay, and the Ray entries are exercised end-to-end on
a tiny corpus (the SQL equivalence for bpe_pair_counts runs in
tests/test_entry_contract.py)."""

from collections import Counter

import pandas as pd
import pytest


def naive_bpe(words, n_merges):
    """Recompute every pair count from scratch each iteration — the
    O(n_merges * vocab) textbook form used as the truth oracle."""
    seqs = [list(w) for w, _ in words]
    freqs = [f for _, f in words]
    merges = []
    for rank in range(n_merges):
        counts = Counter()
        for seq, f in zip(seqs, freqs):
            for pair in zip(seq, seq[1:]):
                counts[pair] += f
        if not counts:
            break
        (left, right), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, cnt))
        for idx, seq in enumerate(seqs):
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[idx] = out
    return merges


WORDS = [
    ("lower", 5),
    ("lowest", 3),
    ("newer", 6),
    ("wider", 2),
    ("low", 7),
    ("new", 4),
    ("newest", 1),
    ("widest", 1),
    ("aaaa", 3),  # overlapping-pair edge: aa aa merges non-greedily
    ("banana", 2),
]


def test_merge_loop_matches_naive():
    from seekr_ray.extras.bpe import _merge_loop

    assert _merge_loop(list(WORDS), 30) == naive_bpe(list(WORDS), 30)


def test_merge_loop_tie_break_is_lexicographic():
    from seekr_ray.extras.bpe import _merge_loop

    # two pairs with equal counts: 'ab' and 'cd' both appear once
    merges = _merge_loop([("ab", 1), ("cd", 1)], 1)
    assert merges[0][1:3] == ("a", "b")


def test_encode_word_equals_rank_replay():
    from seekr_ray.extras.bpe import _merge_loop, encode_word

    merges = _merge_loop(list(WORDS), 30)
    ranks = {(l, r): k for k, l, r, _ in merges}
    for w, _ in WORDS + [("unseenword", 0), ("x", 0), ("", 0)]:
        # replay: apply each merge rule over the word in rank order
        seq = list(w)
        for _, left, right, _ in merges:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        assert encode_word(w, ranks) == seq, w


def test_bpe_train_and_counts_on_ray(ray_session):
    import ray.data as rd

    from seekr_ray.extras.bpe import (
        bpe_pair_counts,
        bpe_token_counts,
        bpe_train,
        encode_word,
        word_frequencies,
    )
    from seekr_ray.extras.textstats import simple_tokens

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "lower lowest banana lower",
                "newer newest wider banana",
                "lower newer lowest lowest",
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(3)

    wf = dict(
        zip(
            *(
                lambda d: (d["word"], d["freq"])
            )(word_frequencies(ds).to_pandas())
        )
    )
    truth = Counter()
    for t in docs["text"]:
        truth.update(simple_tokens(t))
    assert wf == dict(truth)

    pc = bpe_pair_counts(ds).to_pandas()
    truth_pairs = Counter()
    for w, f in truth.items():
        for i in range(len(w) - 1):
            truth_pairs[w[i : i + 2]] += f
    assert dict(zip(pc["pair"], pc["cnt"])) == dict(truth_pairs)
    assert list(pc["pair"]) == sorted(pc["pair"])  # oracle order

    merges = bpe_train(ds, 10)
    assert merges.num_rows > 0
    expected = naive_bpe(sorted(truth.items(), key=lambda kv: (-kv[1], kv[0])), 10)
    got = list(
        zip(
            merges["rank"].to_pylist(),
            merges["left"].to_pylist(),
            merges["right"].to_pylist(),
            merges["freq"].to_pylist(),
        )
    )
    assert got == expected

    ranks = {
        (l, r): k
        for k, l, r in zip(
            merges["rank"].to_pylist(),
            merges["left"].to_pylist(),
            merges["right"].to_pylist(),
        )
    }
    counts = (
        bpe_token_counts(ds, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in counts.iterrows():
        text = docs.loc[docs.doc_id == row["doc_id"], "text"].iloc[0]
        want = sum(len(encode_word(w, ranks)) for w in simple_tokens(text))
        assert row["n_bpe_tokens"] == want


def test_top_words_cap_is_deterministic(ray_session):
    import ray.data as rd

    from seekr_ray.extras.bpe import top_words, word_frequencies

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "apple apple apple",
                "berry berry cherry",
                "cherry berry apple",
                "damson damson damson",
                "elder elder elder",
                "figly figly figly",
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(4)
    wf = word_frequencies(ds)
    top3 = top_words(wf, 3)
    # apple=4, damson/elder/figly=3 each, berry=3 ... ties break word-asc
    assert top3[0] == ("apple", 4)
    assert [w for w, _ in top3] == ["apple", "berry", "damson"]
    assert len(top_words(wf, 100)) == 6
