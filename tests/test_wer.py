"""WER scorer (ast_tpu/eval/wer.py): alignment counts on hand-checked
cases, trn parsing, corpus aggregation, and the CLI over both hyp
layouts."""

from ast_tpu.eval import wer


def test_edit_stats_hand_cases():
    assert wer.edit_stats("a b c".split(), "a b c".split()) == (0, 0, 0)
    assert wer.edit_stats("a b c".split(), "a x c".split()) == (1, 0, 0)
    assert wer.edit_stats("a b c".split(), "a b c d".split()) == (0, 1, 0)
    assert wer.edit_stats("a b c".split(), "a c".split()) == (0, 0, 1)
    assert wer.edit_stats("a b".split(), []) == (0, 0, 2)
    assert wer.edit_stats([], "a b".split()) == (0, 2, 0)
    # classic: kitten -> sitting at char level = 2 sub + 1 ins
    assert wer.edit_stats(list("kitten"), list("sitting")) == (2, 1, 0)


def test_corpus_wer_aggregates_and_handles_missing():
    refs = {"u1": "the cat sat".split(), "u2": "on the mat".split()}
    hyps = {"u1": "the cat sat".split()}          # u2 missing -> deleted
    s = wer.corpus_wer(refs, hyps)
    assert (s["sub"], s["ins"], s["del"]) == (0, 0, 3)
    assert s["n_ref"] == 6 and abs(s["wer"] - 0.5) < 1e-12
    assert s["per_utt"]["u2"] == (0, 0, 3, 3)
    assert "[ 3 / 6, 0 ins, 3 del, 0 sub ]" in wer.format_report(s)


def test_trn_roundtrip_and_cli(tmp_path):
    refs = tmp_path / "dev.clean.wer"
    refs.write_text("the cat sat (utt_a)\non the mat (utt_b)\n")
    parsed = wer.read_trn(str(refs))
    assert parsed == {"utt_a": "the cat sat".split(),
                      "utt_b": "on the mat".split()}

    # trn-format hypotheses
    hyp_trn = tmp_path / "hyp.wer"
    hyp_trn.write_text("the cat sit (utt_a)\non the mat (utt_b)\n")
    stats = wer.main([str(refs), str(hyp_trn)])
    assert stats["errors"] == 1 and stats["sub"] == 1

    # plain lines ordered by eval.ids (the BLEU hyp-file layout)
    ids = tmp_path / "eval.ids"
    ids.write_text("utt_a\nutt_b\n")
    hyp_txt = tmp_path / "hyp.en"
    hyp_txt.write_text("the cat sit\non the mat\n")
    stats2 = wer.main([str(refs), str(hyp_txt), "--ids", str(ids),
                       "--per-utt"])
    assert stats2["errors"] == 1 and stats2["wer"] == stats["wer"]


def test_wer_rejects_mismatched_inputs(tmp_path):
    refs = {"u1": ["a"]}
    try:
        wer.corpus_wer(refs, {"u1": ["a"], "uX": ["b"]})
    except ValueError as e:
        assert "uX" in str(e)
    else:
        raise AssertionError("stray hypothesis utt should be rejected")

    ids = tmp_path / "eval.ids"
    ids.write_text("u1\n")
    hyp = tmp_path / "hyp.en"
    hyp.write_text("a\nb\n")           # more lines than ids
    try:
        wer._read_hyps(str(hyp), str(ids))
    except ValueError as e:
        assert "2 hypothesis lines" in str(e)
    else:
        raise AssertionError("extra hyp lines should be rejected")
