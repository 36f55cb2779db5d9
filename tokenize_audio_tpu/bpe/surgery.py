"""Tokenizer surgery utilities.

Capability equivalent of the reference's ``codec-bpe/qwen3x.ipynb``: rename
an existing special token in place (keeping its id — e.g. ``<|endoftext|>``
-> ``<|end_of_text|>`` at id 151643), add a BOS token, resize the model's
token embeddings to the extended vocab (the notebook's final step — the
one that makes the audio-extended tokenizer usable for pretraining), and
sanity-check the result. Works on any ``PreTrainedTokenizerFast`` saved
directory / ``PreTrainedModel``.
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


def extend_model_embeddings(
    model,
    new_vocab_size: int,
    num_tokens_to_copy: int | None = None,
    noise_std: float = 0.02,
    seed: int = 0,
):
    """Resize a causal LM's token embeddings to an extended vocabulary.

    The final step of the reference's tokenizer-surgery recipe
    (``codec-bpe/qwen3x.ipynb``, "extend the current embedding ... from
    151936 to 168059"): rows ``[0, num_tokens_to_copy)`` keep their trained
    values; every new row is initialized to the mean of the copied rows
    plus small Gaussian noise (std ``noise_std``), in the model's own
    dtype. An untied ``lm_head`` is extended the same way; tied weights
    follow the embedding automatically.

    ``num_tokens_to_copy`` defaults to the current embedding size; pass a
    smaller value to drop trailing distributed-training padding rows (the
    notebook copies only 151669 of Qwen3's 151936 padded rows). Returns the
    model (modified in place).
    """
    import torch

    embed = model.get_input_embeddings()
    old = embed.weight.data
    n_copy = old.shape[0] if num_tokens_to_copy is None else num_tokens_to_copy
    if n_copy > old.shape[0]:
        raise ValueError(
            f"num_tokens_to_copy {n_copy} exceeds current vocab {old.shape[0]}"
        )
    if new_vocab_size < n_copy:
        raise ValueError(
            f"new_vocab_size {new_vocab_size} smaller than rows to copy {n_copy}"
        )
    gen = torch.Generator().manual_seed(seed)

    def _extend(w: torch.Tensor) -> torch.Tensor:
        kept = w[:n_copy]
        # mean in f32 (a bf16 accumulation over 150k rows loses ~3 digits),
        # on CPU: `gen` is a CPU generator, so build the new rows there and
        # move once — mixing a CUDA-resident mean with CPU noise would crash
        mean = kept.float().mean(dim=0).cpu()
        noise = torch.randn(
            (new_vocab_size - n_copy, w.shape[1]), generator=gen, dtype=torch.float32
        ) * noise_std
        new_rows = (mean[None, :] + noise).to(dtype=w.dtype, device=w.device)
        return torch.cat([kept, new_rows], dim=0)

    tied = getattr(model.config, "tie_word_embeddings", False)
    new_embed = torch.nn.Embedding(
        new_vocab_size, old.shape[1], dtype=old.dtype, device=old.device
    )
    with torch.no_grad():
        new_embed.weight.copy_(_extend(old))
    model.set_input_embeddings(new_embed)

    head = model.get_output_embeddings()
    if head is not None:
        if tied:
            model.tie_weights()  # re-point the head at the new embedding
        else:
            new_head = torch.nn.Linear(
                head.in_features,
                new_vocab_size,
                bias=head.bias is not None,
                dtype=head.weight.dtype,
                device=head.weight.device,
            )
            with torch.no_grad():
                new_head.weight.copy_(_extend(head.weight.data))
                if head.bias is not None:
                    new_head.bias.zero_()
                    new_head.bias[:n_copy].copy_(head.bias.data[:n_copy])
            model.set_output_embeddings(new_head)
    model.config.vocab_size = new_vocab_size
    model.vocab_size = new_vocab_size
    return model


def set_bos_token(tokenizer_dir: str, bos: str, add_if_missing: bool = True):
    """Load, optionally add, and register a BOS token; returns the tokenizer."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tokenizer_dir)
    if bos not in tok.get_vocab() and add_if_missing:
        tok.add_special_tokens({"bos_token": bos})
    else:
        tok.bos_token = bos
    return tok
