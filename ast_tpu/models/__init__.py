from ast_tpu.models import seq2seq

__all__ = ["seq2seq"]
