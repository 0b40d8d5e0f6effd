"""CLIP text stack: BPE tokenizer + causal text encoder vs the reference
torch implementation (core/model/featurizers/maskclip/)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.reference_oracle import setup_reference

HAS_REF = setup_reference()

BPE_PATH = Path(
    "/root/reference/core/model/featurizers/maskclip/bpe_simple_vocab_16e6.txt.gz")


@pytest.mark.skipif(not BPE_PATH.exists(), reason="BPE vocab unavailable")
def test_tokenizer_canonical_ids():
    """The canonical CLIP example must produce the well-known token ids
    (sot=49406, 'a photo of a cat' = 320/1125/539/320/2368, eot=49407) and
    decode back; framing pads with zeros to the context length."""
    from isegprobe_tpu.models.featurizers.clip_tokenizer import ClipTokenizer

    tok = ClipTokenizer(str(BPE_PATH))
    assert (tok.sot, tok.eot) == (49406, 49407)
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]
    assert tok.decode([320, 1125, 539, 320, 2368]).strip() == "a photo of a cat"

    ctx = tok(["A Photo   of a CAT!", "dog"], context_length=10)
    assert ctx.shape == (2, 10) and ctx.dtype == np.int32
    assert ctx[0, 0] == 49406
    assert 49407 in ctx[0] and 49407 in ctx[1]
    assert ctx[1, 3] == 0  # zero-padded
    # truncation keeps eot as the final token
    long = tok("cat " * 50, context_length=8)
    assert long[0, -1] == 49407
    # literal specials in input text map to their single ids, never BPE-split
    assert tok.encode("<|endoftext|>") == [49407]
    assert tok.encode("<|startoftext|>") == [49406]


@pytest.mark.skipif(not BPE_PATH.exists(), reason="BPE vocab unavailable")
def test_tokenizer_roundtrip_fuzz():
    """decode(encode(text)) recovers the cleaned text for random ASCII."""
    import random

    from isegprobe_tpu.models.featurizers.clip_tokenizer import ClipTokenizer

    tok = ClipTokenizer(str(BPE_PATH))
    rng = random.Random(0)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789.,!?'- "
    for _ in range(25):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
        cleaned = tok.clean(text)
        ids = tok.encode(text)
        assert all(0 <= i < 49408 for i in ids)
        if cleaned:
            # spaces are not encoded (the word regex drops them) and decode
            # renders a space per BPE word-end — the lossless content is the
            # character stream, so compare space-free
            assert (tok.decode(ids).replace(" ", "")
                    == cleaned.replace(" ", "")), repr(text)


@pytest.mark.skipif(not HAS_REF, reason="reference tree unavailable")
def test_tokenizer_matches_reference():
    """Exact end-to-end parity with the reference SimpleTokenizer. Runs
    WITHOUT ftfy installed (VERDICT r4 #8): reference_oracle equips the ftfy
    stub with the vendored deterministic cleaner (fix_text_offline), so both
    tokenizers clean through the identical pipeline — including the unicode
    cases below that exercise the vendored NFC/ligature/width/quote rules
    through the full BPE stack."""
    from core.model.featurizers.maskclip.simple_tokenizer import SimpleTokenizer

    from isegprobe_tpu.models.featurizers.clip_tokenizer import ClipTokenizer

    ref = SimpleTokenizer(str(BPE_PATH))
    ours = ClipTokenizer(str(BPE_PATH))
    for text in ["a photo of a cat", "Hello, WORLD!! 42 foo-bar",
                 "the quick brown fox jumps over the lazy dog's tail",
                 "unphotographable 12345 ... ???",
                 # vendored-cleaner coverage: curly quotes, NFD accents,
                 # Latin ligatures, fullwidth forms, html entities,
                 # control chars, mixed line breaks
                 "“nice” photo of the café’s ﬁnest ﬂoor",
                 "Ｆｕｌｌｗｉｄｔｈ ４２ &amp;amp; entities",
                 "ctrl\x07chars\x1f and\r\nline breaks",
                 "déjà vu été"]:
        assert ours.encode(text) == ref.encode(text), text


@pytest.mark.skipif(not HAS_REF, reason="reference tree unavailable")
def test_text_encoder_parity():
    """Tiny random-weight CLIP text tower: torch encode_text vs ours through
    convert_clip_text (pools at the per-row argmax eot position)."""
    import torch

    from core.model.featurizers.maskclip.model import CLIP

    from isegprobe_tpu.models.convert import convert_clip_text
    from isegprobe_tpu.models.featurizers.maskclip import CLIPTextEncoder

    torch.manual_seed(0)
    width, heads, layers, vocab, ctx, out_dim = 64, 4, 2, 128, 16, 32
    tm = CLIP(embed_dim=out_dim, image_resolution=32, vision_layers=1,
              vision_width=64, vision_patch_size=16, context_length=ctx,
              vocab_size=vocab, transformer_width=width,
              transformer_heads=heads, transformer_layers=layers).eval()

    rng = np.random.default_rng(0)
    ids = np.zeros((3, ctx), np.int64)
    for r in range(3):
        n = int(rng.integers(3, ctx - 1))
        ids[r, 0] = vocab - 2  # sot
        ids[r, 1:n] = rng.integers(1, vocab - 2, n - 1)
        ids[r, n] = vocab - 1  # eot (highest id -> argmax pooling)
    with torch.no_grad():
        want = tm.encode_text(torch.from_numpy(ids)).float().numpy()

    jm = CLIPTextEncoder(width=width, heads=heads, layers=layers,
                         vocab_size=vocab, context_length=ctx,
                         output_dim=out_dim)
    params = convert_clip_text(
        {k: v for k, v in tm.state_dict().items()}, layers=layers)
    got = np.asarray(jm.apply({"params": params}, jnp.asarray(ids)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_text_encoder_shapes_and_grad():
    """Offline-safe leg: init + forward + grads flow (the text tower is
    trainable like any flax module)."""
    from isegprobe_tpu.models.featurizers.maskclip import CLIPTextEncoder

    m = CLIPTextEncoder(width=32, heads=2, layers=1, vocab_size=64,
                        context_length=8, output_dim=16)
    ids = jnp.asarray(np.array([[62, 5, 9, 63, 0, 0, 0, 0]], np.int32))
    params = m.init(jax.random.PRNGKey(0), ids)["params"]
    out = m.apply({"params": params}, ids)
    assert out.shape == (1, 16)

    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, ids) ** 2))(params)
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
