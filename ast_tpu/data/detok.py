"""Shared id->text detokenization core.

One source of truth for the reference's detokenization contract
(reference: dataloader.py:167-183): specials (ids < 4) are dropped
wherever they occur, tokens after EOS are KEPT (the reference's EOS
truncation is commented out), ``*_w`` word units join with spaces and
char units join bare, and ``bpe_w`` merges the subword-nmt ``@@ ``
joiner.  Used by the dataloader's ``get_hyps``, the artifact HTTP
server (cli/serve.py), and anything else that turns decoder ids into
text — so the contract cannot silently fork.
"""

from ast_tpu.symbols import SYMBOLS


def ids_to_text(ids, lookup, dec_key):
    """Token ids -> canonical text string.

    ``lookup``: id -> token string (str, already decoded)."""
    join = " " if dec_key.endswith("_w") else ""
    text = join.join(lookup(i) for i in ids if i >= SYMBOLS.N_SPECIAL)
    if "bpe_w" in dec_key:
        text = text.replace("@@ ", "")
    return " ".join(text.strip().split())
