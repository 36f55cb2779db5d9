"""Tokenizer surgery utilities.

Capability equivalent of the reference's ``codec-bpe/qwen3x.ipynb``: rename
an existing special token in place (keeping its id — e.g. ``<|endoftext|>``
-> ``<|end_of_text|>`` at id 151643), add a BOS token, and sanity-check the
result. Works on any ``PreTrainedTokenizerFast`` saved directory.
"""

from __future__ import annotations

import json
import os
import shutil


def rename_token_in_place(tokenizer_dir: str, old: str, new: str, out_dir: str) -> None:
    """Copy a fast-tokenizer directory, renaming ``old`` -> ``new`` in the
    vocab (id preserved) and in every special-token config reference."""
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(tokenizer_dir):
        src = os.path.join(tokenizer_dir, f)
        if os.path.isfile(src):
            shutil.copyfile(src, os.path.join(out_dir, f))

    tok_json = os.path.join(out_dir, "tokenizer.json")
    with open(tok_json) as f:
        data = json.load(f)
    vocab = data["model"]["vocab"]
    if old not in vocab:
        raise KeyError(f"token {old!r} not in vocab")
    if new in vocab:
        raise ValueError(f"token {new!r} already in vocab")
    vocab[new] = vocab.pop(old)
    for added in data.get("added_tokens", []):
        if added.get("content") == old:
            added["content"] = new
    with open(tok_json, "w") as f:
        json.dump(data, f, ensure_ascii=False)

    for cfg_name in ("tokenizer_config.json", "special_tokens_map.json"):
        path = os.path.join(out_dir, cfg_name)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            cfg = json.load(f)

        def _sub(x):
            if isinstance(x, str):
                return new if x == old else x
            if isinstance(x, dict):
                return {k: _sub(v) for k, v in x.items()}
            if isinstance(x, list):
                return [_sub(v) for v in x]
            return x

        with open(path, "w") as f:
            json.dump(_sub(cfg), f, ensure_ascii=False)


def set_bos_token(tokenizer_dir: str, bos: str, add_if_missing: bool = True):
    """Load, optionally add, and register a BOS token; returns the tokenizer."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tokenizer_dir)
    if bos not in tok.get_vocab() and add_if_missing:
        tok.add_special_tokens({"bos_token": bos})
    else:
        tok.bos_token = bos
    return tok
