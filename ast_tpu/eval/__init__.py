from ast_tpu.eval.bleu import Eval, corpus_bleu
from ast_tpu.eval.metrics import unigram_precision_recall

__all__ = ["Eval", "corpus_bleu", "unigram_precision_recall"]
