"""BPE learner/applier: subword-nmt-compatible conventions."""

from ast_tpu.data.bpe import apply_bpe, learn_bpe, load_merges, save_merges


CORPUS = [
    ["low", "low", "lower", "lowest"],
    ["new", "newer", "newest", "low"],
] * 5


def test_learn_and_apply():
    merges = learn_bpe(CORPUS, num_merges=50)
    assert len(merges) > 0
    out = apply_bpe(merges, ["low"])
    # frequent whole word ends up unsegmented
    assert out == ["low"]


def test_unseen_word_segments():
    merges = learn_bpe(CORPUS, num_merges=10)
    out = apply_bpe(merges, ["lowly"])
    # continuation markers on all non-final pieces
    assert all(p.endswith("@@") for p in out[:-1])
    assert "".join(p.replace("@@", "") for p in out) == "lowly"


def test_detok_roundtrip():
    """apply + reference-style '@@ ' join restores the original text."""
    merges = learn_bpe(CORPUS, num_merges=30)
    words = ["newest", "lower", "xyzzy"]
    pieces = apply_bpe(merges, words)
    joined = " ".join(pieces).replace("@@ ", "")
    assert joined == " ".join(words)


def test_merges_io(tmp_path):
    merges = learn_bpe(CORPUS, num_merges=20)
    p = str(tmp_path / "bpe.codes")
    save_merges(merges, p)
    assert load_merges(p) == merges


def test_merges_io_hash_token_roundtrips(tmp_path):
    """Only the '#version:' header is a comment — a merge whose first
    symbol starts with '#' (corpus token like '#yes') must survive the
    save/load roundtrip."""
    merges = [("#", "y"), ("#y", "es</w>")]
    p = str(tmp_path / "hash.codes")
    save_merges(merges, p)
    assert load_merges(p) == merges
