"""Tokenizer surgery: in-place rename keeping ids, BOS registration."""

from tokenize_audio_tpu.bpe import CodecBPETrainer
from tokenize_audio_tpu.bpe.surgery import rename_token_in_place, set_bos_token


def make_base(tmp_path, rng):
    import numpy as np

    arrays = [rng.integers(0, 4, size=(2, 16), dtype=np.uint16) for _ in range(4)]
    obj = np.empty(len(arrays), dtype=object)
    obj[:] = arrays
    np.save(str(tmp_path / "c.npy"), obj, allow_pickle=True)
    tok = CodecBPETrainer(
        2, 4, vocab_size=2 * 4 + 2, eos_token="<|endoftext|>", unk_token="<unk>",
        max_token_codebook_ngrams=0, unicode_offset=0xF000,
    ).train(str(tmp_path))
    d = str(tmp_path / "base")
    tok.save_pretrained(d)
    return d, tok


def test_rename_preserves_id(tmp_path, rng):
    base_dir, base = make_base(tmp_path, rng)
    old_id = base.convert_tokens_to_ids("<|endoftext|>")
    out_dir = str(tmp_path / "renamed")
    rename_token_in_place(base_dir, "<|endoftext|>", "<|end_of_text|>", out_dir)
    from transformers import AutoTokenizer

    tok2 = AutoTokenizer.from_pretrained(out_dir)
    assert tok2.convert_tokens_to_ids("<|end_of_text|>") == old_id
    assert tok2.convert_tokens_to_ids("<|endoftext|>") == tok2.unk_token_id or (
        "<|endoftext|>" not in tok2.get_vocab()
    )


def _tiny_lm(tie: bool, vocab_size: int = 32):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=vocab_size,
        hidden_size=16,
        intermediate_size=32,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        tie_word_embeddings=tie,
    )
    return LlamaForCausalLM(cfg)


def test_extend_model_embeddings_untied():
    import torch

    from tokenize_audio_tpu.bpe.surgery import extend_model_embeddings

    model = _tiny_lm(tie=False)
    orig_embed = model.get_input_embeddings().weight.data.clone()
    orig_head = model.get_output_embeddings().weight.data.clone()
    extend_model_embeddings(model, 48, num_tokens_to_copy=30, noise_std=0.01)

    w = model.get_input_embeddings().weight.data
    assert w.shape == (48, 16) and model.config.vocab_size == 48
    assert torch.equal(w[:30], orig_embed[:30])  # trained rows untouched
    mean = orig_embed[:30].float().mean(0)
    # new rows = mean + N(0, 0.01): all near the mean, but not identical
    assert (w[30:] - mean).abs().max() < 0.1
    assert not torch.equal(w[30], w[31])
    h = model.get_output_embeddings().weight.data
    assert h.shape == (48, 16)
    assert torch.equal(h[:30], orig_head[:30])
    # the model must actually run with a new-vocab token id
    out = model(torch.tensor([[47, 2, 33]]))
    assert out.logits.shape == (1, 3, 48)


def test_extend_model_embeddings_tied():
    import torch

    from tokenize_audio_tpu.bpe.surgery import extend_model_embeddings

    model = _tiny_lm(tie=True)
    extend_model_embeddings(model, 40)
    w = model.get_input_embeddings().weight
    h = model.get_output_embeddings().weight
    assert w.shape == (40, 16)
    assert h.data_ptr() == w.data_ptr()  # still tied after the resize
    out = model(torch.tensor([[39, 0]]))
    assert out.logits.shape == (1, 2, 40)


def test_extend_model_embeddings_rejects_shrink():
    import pytest

    from tokenize_audio_tpu.bpe.surgery import extend_model_embeddings

    model = _tiny_lm(tie=False)
    with pytest.raises(ValueError):
        extend_model_embeddings(model, 16)
    with pytest.raises(ValueError):
        extend_model_embeddings(model, 64, num_tokens_to_copy=33)


def test_set_bos(tmp_path, rng):
    base_dir, base = make_base(tmp_path, rng)
    n = len(base)
    tok = set_bos_token(base_dir, "<|begin_of_text|>")
    assert tok.bos_token == "<|begin_of_text|>"
    assert len(tok) == n + 1


def test_cli_end_to_end(tmp_path, rng):
    """`python -m tokenize_audio_tpu.bpe.surgery` runs the whole qwen3x
    recipe: rename + BOS + audio alphabet + pipeline specials + model
    embedding resize, in one command (MIGRATION.md maps the notebook
    here)."""
    import json

    from transformers import AutoTokenizer

    from tokenize_audio_tpu.bpe import surgery

    base_dir, base = make_base(tmp_path, rng)
    old_id = base.convert_tokens_to_ids("<|endoftext|>")
    model_dir = str(tmp_path / "lm")
    # smaller than the extended vocab, like Qwen3 vs qwen3x
    _tiny_lm(tie=False, vocab_size=16).save_pretrained(model_dir)
    out_dir, model_out = str(tmp_path / "qx"), str(tmp_path / "lmx")

    surgery.main(
        [
            "--tokenizer", base_dir,
            "--out-dir", out_dir,
            "--rename", "<|endoftext|>=<|end_of_text|>",
            "--bos", "<|begin_of_text|>",
            "--add-audio-alphabet",
            "--num-codebooks", "2",
            "--codebook-size", "4",
            "--unicode-offset", "0xE000",
            "--pipeline-specials",
            "--model", model_dir,
            "--model-out", model_out,
        ]
    )
    tok = AutoTokenizer.from_pretrained(out_dir)
    # rename kept the id; BOS registered; alphabet + specials present
    assert tok.convert_tokens_to_ids("<|end_of_text|>") == old_id
    assert tok.bos_token == "<|begin_of_text|>"
    for ch in (chr(0xE000), chr(0xE000 + 2 * 4 - 1)):
        assert ch in tok.get_vocab()
    assert "<|audio_start|>" in tok.get_vocab()
    # the resized model loads and covers the new vocab
    import torch
    from transformers import AutoModelForCausalLM

    lm = AutoModelForCausalLM.from_pretrained(model_out)
    assert lm.config.vocab_size == len(tok)
    ids = torch.tensor([[len(tok) - 1, tok.convert_tokens_to_ids(chr(0xE000))]])
    with torch.no_grad():
        assert lm(ids).logits.shape[-1] == len(tok)


def test_cli_num_tokens_to_copy(tmp_path, rng):
    """--num-tokens-to-copy drops the base model's trailing padding rows:
    new tokens must get mean+noise rows, not stale padding embeddings
    (qwen3x copies 151669 of Qwen3's 151936)."""
    import torch
    from transformers import AutoModelForCausalLM

    from tokenize_audio_tpu.bpe import surgery

    base_dir, base = make_base(tmp_path, rng)
    n_real = len(base)  # pretend rows >= n_real are distributed padding
    model_dir = str(tmp_path / "lm_padded")
    lm = _tiny_lm(tie=False, vocab_size=32)
    with torch.no_grad():  # make the padding rows recognizably garbage
        lm.get_input_embeddings().weight[n_real:] = 1e6
    lm.save_pretrained(model_dir)
    out_dir, model_out = str(tmp_path / "qx2"), str(tmp_path / "lmx2")

    surgery.main(
        [
            "--tokenizer", base_dir,
            "--out-dir", out_dir,
            "--add-audio-alphabet",
            "--num-codebooks", "2",
            "--codebook-size", "4",
            "--unicode-offset", "0xE000",
            "--model", model_dir,
            "--model-out", model_out,
            "--num-tokens-to-copy", str(n_real),
        ]
    )
    got = AutoModelForCausalLM.from_pretrained(model_out)
    w = got.get_input_embeddings().weight
    assert w.shape[0] > n_real
    # kept rows exact; every re-initialized row is mean+noise, NOT the 1e6 garbage
    assert torch.equal(w[:n_real], lm.get_input_embeddings().weight[:n_real])
    assert w[n_real:].abs().max().item() < 100.0
