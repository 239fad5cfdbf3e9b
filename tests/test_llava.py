"""llava / CLIP vision tests.

Equivalence target: transformers CLIPVisionModel (the reference validated
clip.cpp against the same HF weights). The projector uses ggml_gelu (tanh
approx, clip.cpp:676), so the torch expectation uses approximate='tanh'.
"""

import numpy as np
import pytest

pytest.importorskip("transformers")
import torch
from transformers import CLIPVisionConfig as HFClipConfig
from transformers import CLIPVisionModel

from tpulamm.models.clip import (ClipVisionConfig, encode_image, load_clip,
                                 preprocess_image)
from tpulamm.tools.convert_hf import convert_hf_clip

HID, HEADS, LAYERS, FF, IMG, PATCH, PROJ = 64, 2, 3, 128, 32, 8, 48


@pytest.fixture(scope="module")
def clip_setup(tmp_path_factory):
    torch.manual_seed(3)
    hf_cfg = HFClipConfig(
        hidden_size=HID, num_attention_heads=HEADS, num_hidden_layers=LAYERS,
        intermediate_size=FF, image_size=IMG, patch_size=PATCH,
        hidden_act="quick_gelu", layer_norm_eps=1e-5)
    vision = CLIPVisionModel(hf_cfg).eval()
    lin1 = torch.nn.Linear(HID, PROJ)
    lin2 = torch.nn.Linear(PROJ, PROJ)
    proj_sd = {"multi_modal_projector.linear_1.weight": lin1.weight.detach().numpy(),
               "multi_modal_projector.linear_1.bias": lin1.bias.detach().numpy(),
               "multi_modal_projector.linear_2.weight": lin2.weight.detach().numpy(),
               "multi_modal_projector.linear_2.bias": lin2.bias.detach().numpy()}
    sd = {k: v.float().numpy() for k, v in vision.state_dict().items()}
    path = str(tmp_path_factory.mktemp("clip") / "mmproj.gguf")
    convert_hf_clip(sd, hf_cfg, path, proj_sd=proj_sd, skip_last=0)
    return vision, (lin1, lin2), path


def test_clip_matches_hf(clip_setup):
    vision, (lin1, lin2), path = clip_setup
    cfg, params = load_clip(path, compute_dtype=np.float32)
    assert cfg.n_layers == LAYERS and cfg.n_patches == (IMG // PATCH) ** 2

    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    ours = np.asarray(encode_image(cfg, params, pix))

    with torch.no_grad():
        hf_out = vision(torch.from_numpy(pix.transpose(0, 3, 1, 2)),
                        output_hidden_states=True)
        feats = hf_out.hidden_states[-1][:, 1:]      # pre-post_layernorm
        exp = lin2(torch.nn.functional.gelu(lin1(feats), approximate="tanh"))
    np.testing.assert_allclose(ours, exp.numpy(), rtol=2e-3, atol=2e-3)


def test_clip_skip_last_layer(clip_setup):
    """skip_last=1 == llava's vision_feature_layer=-2 (penultimate)."""
    vision, (lin1, lin2), _ = clip_setup
    import tempfile
    sd = {k: v.float().numpy() for k, v in vision.state_dict().items()}
    with tempfile.TemporaryDirectory() as d:
        convert_hf_clip(sd, vision.config, f"{d}/mm.gguf", skip_last=1)
        cfg, params = load_clip(f"{d}/mm.gguf", compute_dtype=np.float32)
    assert cfg.n_layers == LAYERS - 1
    assert len(params["layers"]) == LAYERS - 1
    assert params["mm"] == {}


def test_preprocess_pad2square():
    cfg = ClipVisionConfig(hidden_size=HID, n_heads=HEADS, n_layers=LAYERS,
                           n_ff=FF, image_size=IMG, patch_size=PATCH)
    img = np.full((10, 20, 3), 200, np.uint8)
    out = preprocess_image(img, cfg)
    assert out.shape == (IMG, IMG, 3)
    # padded rows carry the background mean color -> normalize to ~0
    assert abs(out[0, IMG // 2, 0]) < 0.05
    assert out[IMG // 2, IMG // 2, 0] > 1.0          # bright content pixel


def test_eval_embeds_matches_tokens():
    """Injecting the model's own token embeddings through eval_embeds must
    reproduce the token prefill path (llama_batch.embd parity)."""
    import jax.numpy as jnp
    from tests.test_engine import VOCAB, make_vocab_md  # reuse tiny fixture
    from tpulamm.gguf.constants import GGMLType
    from tpulamm.models.transformer import embed
    from tpulamm.runtime.engine import Engine
    from tpulamm.tools.convert_hf import convert_hf_llama
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    import tempfile

    torch.manual_seed(1)
    hf = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)).eval()
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    with tempfile.TemporaryDirectory() as d:
        convert_hf_llama(sd, hf.config, f"{d}/m.gguf", qtype=GGMLType.F16,
                         vocab=make_vocab_md())
        toks = [1, 9, 33, 7]
        eng1 = Engine(f"{d}/m.gguf", n_ctx=32)
        ref = eng1.prefill(0, toks)

        eng2 = Engine(f"{d}/m.gguf", n_ctx=32)
        emb = np.asarray(embed(eng2.params, eng2.cfg,
                               jnp.asarray(toks)), np.float32)
        got = eng2.eval_embeds(0, emb)
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
        assert eng2.n_past[0] == len(toks)
        # stream continues: a token decode after the embeds works
        nxt = eng2.decode_one(0, int(np.argmax(got)))
        assert nxt.shape[-1] == VOCAB


def test_llava_cli_smoke(clip_setup, tmp_path, capsys):
    """Full pipeline: image file -> CLIP -> projector -> LM -> text."""
    from tests.test_engine import VOCAB, make_vocab_md
    from tpulamm.gguf.constants import GGMLType
    from tpulamm.cli.llava import main as llava_main
    from tpulamm.tools.convert_hf import convert_hf_llama
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    _, _, mmproj = clip_setup
    torch.manual_seed(1)
    hf = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=PROJ, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)).eval()
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    model = str(tmp_path / "lm.gguf")
    convert_hf_llama(sd, hf.config, model, qtype=GGMLType.F32,
                     vocab=make_vocab_md())
    img = str(tmp_path / "img.npy")
    np.save(img, np.random.default_rng(0).integers(
        0, 255, (40, 24, 3)).astype(np.uint8))
    rc = llava_main(["-m", model, "--mmproj", mmproj, "--image", img,
                     "-p", "the <image> cat", "-n", "4", "--temp", "0",
                     "-c", "128"])
    assert rc == 0
    assert capsys.readouterr().out.strip() != ""


# ---------------------------------------------------------------------------
# llava-1.6 anyres grids
# ---------------------------------------------------------------------------

def test_select_best_resolution():
    from tpulamm.models.clip import select_best_resolution
    # flat [w, h, ...] pinpoint list, original 48x96 (h, w)
    pins = (64, 32, 32, 64, 64, 64)
    assert select_best_resolution((48, 96), pins) == (32, 64)
    assert select_best_resolution((96, 48), pins) == (64, 32)


def test_preprocess_anyres_tiles():
    from dataclasses import replace

    from tpulamm.models.clip import preprocess_anyres
    cfg = ClipVisionConfig(
        hidden_size=HID, n_heads=HEADS, n_layers=LAYERS, n_ff=FF,
        image_size=IMG, patch_size=PATCH,
        image_grid_pinpoints=(64, 32, 32, 64, 64, 64))
    img = np.random.default_rng(0).integers(
        0, 255, (48, 96, 3)).astype(np.uint8)
    tiles, (gy, gx), orig = preprocess_anyres(img, cfg)
    assert (gy, gx) == (1, 2)
    assert tiles.shape == (3, IMG, IMG, 3)      # base + 2 grid tiles
    assert orig == (48, 96)


def test_encode_image_anyres_spatial_unpad(clip_setup):
    from dataclasses import replace

    from tpulamm.models.clip import encode_image_anyres, load_clip
    _, _, path = clip_setup
    cfg, params = load_clip(path, compute_dtype=np.float32)
    cfg = replace(cfg, image_grid_pinpoints=(64, 32, 32, 64, 64, 64),
                  mm_patch_merge_type="spatial_unpad")
    params["image_newline"] = np.zeros(PROJ, np.float32)
    img = np.random.default_rng(1).integers(
        0, 255, (48, 96, 3)).astype(np.uint8)
    emb = encode_image_anyres(cfg, params, img)
    # base 16 patches + (4 rows x (8 cols + newline)) = 52
    ph = IMG // PATCH
    assert emb.shape == (ph * ph + ph * (2 * ph + 1), PROJ)
    assert np.isfinite(emb).all()


def test_encode_image_anyres_flat(clip_setup):
    from dataclasses import replace

    from tpulamm.models.clip import encode_image_anyres, load_clip
    _, _, path = clip_setup
    cfg, params = load_clip(path, compute_dtype=np.float32)
    cfg = replace(cfg, image_grid_pinpoints=(64, 64),
                  mm_patch_merge_type="flat")
    img = np.random.default_rng(2).integers(
        0, 255, (50, 50, 3)).astype(np.uint8)
    emb = encode_image_anyres(cfg, params, img)
    ph = IMG // PATCH
    # base + 2x2 grid tiles, flat concat
    assert emb.shape == (5 * ph * ph, PROJ)
