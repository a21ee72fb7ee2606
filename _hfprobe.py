import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, torch, jax.numpy as jnp
from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig
tc = CLIPTextConfig(hidden_size=16, intermediate_size=64, num_hidden_layers=2,
                    num_attention_heads=2, max_position_embeddings=12, vocab_size=50,
                    hidden_act="quick_gelu", projection_dim=16, eos_token_id=49)
vc = CLIPVisionConfig(hidden_size=32, intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, image_size=32, patch_size=8,
                      hidden_act="quick_gelu", projection_dim=16)
cfg = CLIPConfig(text_config=tc.to_dict(), vision_config=vc.to_dict(), projection_dim=16)
torch.manual_seed(0)
tm = CLIPModel(cfg).eval()
from xai_tpu.convert import clip_from_hf
params = clip_from_hf(tm.state_dict(), vision_layers=2, text_layers=2)
from xai_tpu.models import clip as clipmod
jcfg = clipmod.CLIPConfig(patch=8, vision_width=32, vision_layers=2, vision_heads=4,
                          embed_dim=16, text_width=16, text_heads=2, text_layers=2,
                          vocab_size=50, context_length=12, img_hw=32)
jm = clipmod.CLIP(jcfg)
x = np.random.RandomState(0).randn(2,32,32,3).astype(np.float32)
xt = torch.from_numpy(x.transpose(0,3,1,2))
with torch.no_grad():
    hs = tm.vision_model(xt, output_hidden_states=True)
    ref_h1 = hs.hidden_states[1].numpy()
    ref_feat = tm.get_image_features(xt).numpy()
logits, taps = jm.apply({"params": params}, jnp.asarray(x), taps=True, method=clipmod.CLIP.encode_image)
got_b0 = np.asarray(taps["block_out"][0])
print("block0 out Linf:", np.abs(got_b0 - ref_h1).max(), flush=True)
got = np.asarray(logits)[:, 0]
print("image feat Linf:", np.abs(got - ref_feat).max(), flush=True)
with torch.no_grad():
    rt = tm.get_text_features(torch.tensor([[1,5,9,49,0,0,0,0,0,0,0,0]])).numpy()
gt = np.asarray(jm.apply({"params": params}, jnp.asarray(np.array([[1,5,9,49,0,0,0,0,0,0,0,0]],np.int32)), method=clipmod.CLIP.encode_text))
print("text Linf eos=49:", np.abs(gt-rt).max(), flush=True)
