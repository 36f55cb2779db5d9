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


def test_set_bos(tmp_path, rng):
    base_dir, base = make_base(tmp_path, rng)
    n = len(base)
    tok = set_bos_token(base_dir, "<|begin_of_text|>")
    assert tok.bos_token == "<|begin_of_text|>"
    assert len(tok) == n + 1
