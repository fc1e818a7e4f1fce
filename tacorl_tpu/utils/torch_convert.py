"""PyTorch -> Flax weight conversion.

Converts reference-framework checkpoints (torch ``state_dict`` tensors) into
this framework's param trees so released TACO-RL weights can be evaluated for
success-rate parity (SURVEY.md §6, README.md:98-104 checkpoints).

Layer-level primitives (each verified numerically against the corresponding
``torch.nn`` module in tests/test_torch_convert.py):

  * linear:   torch (out, in) kernel -> flax (in, out) transpose
  * conv2d:   torch (out, in, kh, kw) -> flax NHWC (kh, kw, in, out)
  * rnn/gru/lstm cells: torch packed ih/hh weights -> flax cell kernels
  * transformer encoder layer: torch in_proj/out_proj + linear1/2 + norms ->
    flax MultiHeadDotProductAttention + TorchDense + LayerNorm trees
  * embedding / layernorm: direct copies

``state_dict`` values may be torch tensors or numpy arrays.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional

import numpy as np

__all__ = [
    "to_np",
    "convert_linear",
    "convert_conv2d",
    "convert_layernorm",
    "convert_embedding",
    "convert_rnn",
    "convert_transformer_layer",
    "convert_mlp_policy",
    "convert_q_network",
    "convert_lmp_vision_encoder",
    "convert_goal_encoder",
    "convert_plan_recognition_transformer",
    "convert_action_decoder_logistic",
    "convert_visual_actor",
    "convert_visual_critic",
    "assemble_play_lmp",
    "assemble_cql",
    "assemble_tacorl",
    "assemble_ril",
    "load_lightning_state_dict",
]


def to_np(value: Any) -> np.ndarray:
    if hasattr(value, "detach"):
        return value.detach().cpu().numpy()
    return np.asarray(value)


def convert_linear(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": to_np(sd[f"{prefix}weight"]).T}
    if f"{prefix}bias" in sd:
        out["bias"] = to_np(sd[f"{prefix}bias"])
    return out


def convert_conv2d(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    w = to_np(sd[f"{prefix}weight"])  # (out, in, kh, kw)
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if f"{prefix}bias" in sd:
        out["bias"] = to_np(sd[f"{prefix}bias"])
    return out


def convert_layernorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": to_np(sd[f"{prefix}weight"]),
        "bias": to_np(sd[f"{prefix}bias"]),
    }


def convert_embedding(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": to_np(sd[f"{prefix}weight"])}


def convert_rnn(
    sd: Mapping, prefix: str, num_layers: int, cell_type: str = "rnn"
) -> Dict[str, Dict[str, np.ndarray]]:
    """torch nn.RNN/GRU/LSTM packed weights -> StackedRNN cell params.

    flax SimpleCell: {i: Dense(in->h) kernel+bias, h: Dense(h->h, no bias)
    kernel, plus 'bias'? — SimpleCell has dense_i (with bias) and dense_h
    (no bias); torch has bias_ih and bias_hh (both). We fold bias_hh into the
    i-branch bias (mathematically identical since both add into the same
    preactivation).

    GRU/LSTM: flax splits gates into separate Dense params {ir,iz,in,hr,...}
    for GRUCell and {ii,if,ig,io,hi,...} for (Optimized)LSTMCell.
    """
    out: Dict[str, Any] = {}
    for layer in range(num_layers):
        w_ih = to_np(sd[f"{prefix}weight_ih_l{layer}"])  # (gates*h, in)
        w_hh = to_np(sd[f"{prefix}weight_hh_l{layer}"])  # (gates*h, h)
        b_ih = to_np(sd[f"{prefix}bias_ih_l{layer}"])
        b_hh = to_np(sd[f"{prefix}bias_hh_l{layer}"])
        cell: Dict[str, Any] = {}
        if cell_type == "rnn":
            cell["i"] = {"kernel": w_ih.T, "bias": b_ih + b_hh}
            cell["h"] = {"kernel": w_hh.T}
        elif cell_type == "gru":
            h = w_hh.shape[1]
            # torch gate order: r, z, n
            names = ["r", "z", "n"]
            for gi, name in enumerate(names):
                sl = slice(gi * h, (gi + 1) * h)
                # flax GRUCell: ir/iz/in have bias; hr/hz have no bias; hn has
                # bias (the n-gate applies r * (Whn h + bhn))
                cell[f"i{name}"] = {"kernel": w_ih[sl].T, "bias": b_ih[sl]}
                hcell = {"kernel": w_hh[sl].T}
                if name == "n":
                    hcell["bias"] = b_hh[sl]
                else:
                    # fold b_hh into the input-branch bias (adds identically)
                    cell[f"i{name}"]["bias"] = b_ih[sl] + b_hh[sl]
                cell[f"h{name}"] = hcell
        elif cell_type == "lstm":
            h = w_hh.shape[1]
            names = ["i", "f", "g", "o"]  # torch gate order
            # flax OptimizedLSTMCell: i-branch Dense has NO bias, h-branch
            # Dense carries the bias -> fold b_ih + b_hh there
            for gi, name in enumerate(names):
                sl = slice(gi * h, (gi + 1) * h)
                cell[f"i{name}"] = {"kernel": w_ih[sl].T}
                cell[f"h{name}"] = {
                    "kernel": w_hh[sl].T, "bias": b_ih[sl] + b_hh[sl]
                }
        else:
            raise ValueError(cell_type)
        out[f"cell{layer}"] = cell
    return out


def convert_transformer_layer(
    sd: Mapping, prefix: str, num_heads: int
) -> Dict[str, Any]:
    """torch nn.TransformerEncoderLayer -> _PostLNEncoderLayer params."""
    w_in = to_np(sd[f"{prefix}self_attn.in_proj_weight"])  # (3d, d)
    b_in = to_np(sd[f"{prefix}self_attn.in_proj_bias"])
    d = w_in.shape[1]
    head_dim = d // num_heads

    def split_heads(w, b):
        # torch (d, d) row-major out -> flax (d, heads, head_dim)
        kernel = w.T.reshape(d, num_heads, head_dim)
        bias = b.reshape(num_heads, head_dim)
        return {"kernel": kernel, "bias": bias}

    wq, wk, wv = w_in[:d], w_in[d : 2 * d], w_in[2 * d :]
    bq, bk, bv = b_in[:d], b_in[d : 2 * d], b_in[2 * d :]
    w_out = to_np(sd[f"{prefix}self_attn.out_proj.weight"])  # (d, d)
    b_out = to_np(sd[f"{prefix}self_attn.out_proj.bias"])
    attn = {
        "query": split_heads(wq, bq),
        "key": split_heads(wk, bk),
        "value": split_heads(wv, bv),
        "out": {
            "kernel": w_out.T.reshape(num_heads, head_dim, d),
            "bias": b_out,
        },
    }
    return {
        "MultiHeadDotProductAttention_0": attn,
        "TorchDense_0": convert_linear(sd, f"{prefix}linear1."),
        "TorchDense_1": convert_linear(sd, f"{prefix}linear2."),
        "LayerNorm_0": convert_layernorm(sd, f"{prefix}norm1."),
        "LayerNorm_1": convert_layernorm(sd, f"{prefix}norm2."),
    }


# ---------------------------------------------------------------------------
# reference-network assemblies (state_dict prefix -> our param subtree)
# ---------------------------------------------------------------------------


def convert_lmp_vision_encoder(sd: Mapping, prefix: str = "") -> Dict[str, Any]:
    """LMPVisionEncoder: model.{0,2,4}=convs, model.6=SpatialSoftArgmax,
    fc_layers.{0,3}=head (encoder.py:349-428)."""
    out = {
        "conv1": convert_conv2d(sd, f"{prefix}model.0."),
        "conv2": convert_conv2d(sd, f"{prefix}model.2."),
        "conv3": convert_conv2d(sd, f"{prefix}model.4."),
        "fc1": convert_linear(sd, f"{prefix}fc_layers.0."),
        "fc2": convert_linear(sd, f"{prefix}fc_layers.3."),
    }
    temp_key = f"{prefix}model.6.temperature"
    if temp_key in sd:
        out["ssam"] = {"temperature": to_np(sd[temp_key])}
    return out


def convert_goal_encoder(sd: Mapping, prefix: str = "") -> Dict[str, Any]:
    return {
        "TorchDense_0": convert_linear(sd, f"{prefix}mlp.0."),
        "TorchDense_1": convert_linear(sd, f"{prefix}mlp.2."),
        "TorchDense_2": convert_linear(sd, f"{prefix}mlp.4."),
    }


def convert_plan_recognition_transformer(
    sd: Mapping, prefix: str = "", num_layers: int = 2, num_heads: int = 8
) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "Embed_0": convert_embedding(sd, f"{prefix}position_embeddings."),
        "TorchDense_0": convert_linear(sd, f"{prefix}fc."),
        "TorchDense_1": convert_linear(sd, f"{prefix}mean_fc."),
        "TorchDense_2": convert_linear(sd, f"{prefix}variance_fc."),
    }
    for i in range(num_layers):
        out[f"_PostLNEncoderLayer_{i}"] = convert_transformer_layer(
            sd, f"{prefix}transformer_encoder.layers.{i}.", num_heads
        )
    return out


def convert_mlp_policy(
    sd: Mapping, prefix: str = "", num_layers: int = 3,
    discrete_gripper: bool = False,
) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(num_layers):
        out[f"fc{i}"] = convert_linear(sd, f"{prefix}fc_layers.{i}.")
    out["fc_mean"] = convert_linear(sd, f"{prefix}fc_mean.")
    out["fc_log_std"] = convert_linear(sd, f"{prefix}fc_log_std.")
    if discrete_gripper:
        out["gripper_action"] = convert_linear(sd, f"{prefix}gripper_action.")
    return out


def convert_q_network(
    sd: Mapping, prefix: str = "", num_layers: int = 3
) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(num_layers):
        out[f"fc{i}"] = convert_linear(sd, f"{prefix}fc_layers.{i}.")
    out["out"] = convert_linear(sd, f"{prefix}out.")
    return out


def assemble_play_lmp(
    sd: Mapping,
    image_modalities: Optional[List[str]] = None,
    pp_num_layers: int = 3,
    pr_num_layers: int = 2,
    pr_num_heads: int = 8,
    ad_num_layers: int = 2,
    ad_rnn_type: str = "rnn",
    discrete_gripper: bool = True,
) -> Dict[str, Any]:
    """Full reference PlayLMP checkpoint state_dict -> PlayLMPNet param tree.

    Reference attribute prefixes: perceptual_encoder.networks.<mod>.*,
    goal_encoder.mlp.*, plan_recognition.*, plan_proposal.policy.*,
    action_decoder.* (play_lmp_for_rl.py:80-130)."""
    image_modalities = image_modalities or ["rgb_static"]
    encoder: Dict[str, Any] = {}
    for i, modality in enumerate(image_modalities):
        encoder[f"encoders_{i}_1"] = convert_lmp_vision_encoder(
            sd, f"perceptual_encoder.networks.{modality}."
        )
    return {
        "perceptual_encoder": encoder,
        "goal_encoder": convert_goal_encoder(sd, "goal_encoder."),
        "plan_recognition": convert_plan_recognition_transformer(
            sd, "plan_recognition.", pr_num_layers, pr_num_heads
        ),
        "plan_proposal": {
            "policy": convert_mlp_policy(
                sd, "plan_proposal.policy.", pp_num_layers, False
            )
        },
        "action_decoder": convert_action_decoder_logistic(
            sd, "action_decoder.", ad_num_layers, ad_rnn_type, discrete_gripper
        ),
    }


def _convert_late_fusion(
    sd: Mapping, prefix: str, modalities: List[str]
) -> Dict[str, Any]:
    """Reference LateFusion ``networks.<mod>`` dict -> our LateFusion
    ``encoders_{i}_1`` submodule names (modalities in config order)."""
    return {
        f"encoders_{i}_1": convert_lmp_vision_encoder(
            sd, f"{prefix}networks.{modality}."
        )
        for i, modality in enumerate(modalities)
    }


def convert_visual_actor(
    sd: Mapping,
    prefix: str,
    modalities: List[str],
    policy_num_layers: int = 3,
    discrete_gripper: bool = True,
) -> Dict[str, Any]:
    """VisualActorWrapper: actor.encoder.networks.* / actor.goal_encoder.mlp.*
    / actor.actor.policy.* (visual_actor_wrapper.py:18-24 upstream)."""
    return {
        "encoder": _convert_late_fusion(sd, f"{prefix}encoder.", modalities),
        "goal_encoder": convert_goal_encoder(sd, f"{prefix}goal_encoder."),
        "actor": {
            "policy": convert_mlp_policy(
                sd, f"{prefix}actor.policy.", policy_num_layers,
                discrete_gripper,
            )
        },
    }


def convert_visual_critic(
    sd: Mapping,
    prefix: str,
    modalities: List[str],
    q_num_layers: int = 3,
) -> Dict[str, Any]:
    """VisualCriticWrapper: <q>.encoder.* / <q>.goal_encoder.mlp.* /
    <q>.critic.Q.* (visual_critic_wrapper.py:19-21, critic.py:22 upstream;
    our Critic names the Q trunk ``q_network``)."""
    return {
        "encoder": _convert_late_fusion(sd, f"{prefix}encoder.", modalities),
        "goal_encoder": convert_goal_encoder(sd, f"{prefix}goal_encoder."),
        "critic": {
            "q_network": convert_q_network(
                sd, f"{prefix}critic.Q.", q_num_layers
            )
        },
    }


def assemble_cql(
    sd: Mapping,
    modalities: Optional[List[str]] = None,
    policy_num_layers: int = 3,
    q_num_layers: int = 3,
    discrete_gripper: bool = True,
):
    """Full reference CQL_Offline checkpoint -> (params, aux) matching
    CQLModule.init_state's tree (cql_offline_lightning.py:185-228 upstream:
    actor/q1/q2 trainable, target_q1/target_q2 Polyak copies, log_alpha,
    log_alpha_prime when with_lagrange)."""
    modalities = modalities or ["rgb_static"]
    params: Dict[str, Any] = {
        "actor": convert_visual_actor(
            sd, "actor.", modalities, policy_num_layers, discrete_gripper
        ),
        "q1": convert_visual_critic(sd, "q1.", modalities, q_num_layers),
        "q2": convert_visual_critic(sd, "q2.", modalities, q_num_layers),
        "log_alpha": to_np(sd["log_alpha"]).reshape(1),
    }
    if "log_alpha_prime" in sd:
        params["log_alpha_prime"] = to_np(sd["log_alpha_prime"]).reshape(1)
    aux = {
        "target_q1": convert_visual_critic(
            sd, "target_q1.", modalities, q_num_layers
        ),
        "target_q2": convert_visual_critic(
            sd, "target_q2.", modalities, q_num_layers
        ),
    }
    return params, aux


def assemble_tacorl(
    sd: Mapping,
    modalities: Optional[List[str]] = None,
    policy_num_layers: int = 3,
    q_num_layers: int = 3,
    pr_num_layers: int = 2,
    pr_num_heads: int = 8,
    ad_num_layers: int = 2,
    ad_rnn_type: str = "rnn",
    ad_discrete_gripper: bool = True,
):
    """Full reference TACORL checkpoint -> (params, aux) matching
    TACORLModule.init_state's tree (tacorl.py:46-117 upstream: frozen
    play-lmp parts at top level, plan-space actor = plan_proposal inside a
    VisualActorWrapper whose policy emits the latent plan — continuous-only,
    no gripper head)."""
    modalities = modalities or ["rgb_static"]
    params, aux = assemble_cql(
        sd, modalities, policy_num_layers, q_num_layers,
        discrete_gripper=False,
    )
    params.update(
        {
            "perceptual_encoder": _convert_late_fusion(
                sd, "perceptual_encoder.", modalities
            ),
            "plan_recognition": convert_plan_recognition_transformer(
                sd, "plan_recognition.", pr_num_layers, pr_num_heads
            ),
            "goal_encoder": convert_goal_encoder(sd, "goal_encoder."),
            "action_decoder": convert_action_decoder_logistic(
                sd, "action_decoder.", ad_num_layers, ad_rnn_type,
                ad_discrete_gripper,
            ),
        }
    )
    return params, aux


def assemble_ril(
    sd: Mapping,
    modalities: Optional[List[str]] = None,
    hl_num_layers: int = 3,
    ll_num_layers: int = 3,
    ll_discrete_gripper: bool = True,
) -> Dict[str, Any]:
    """Full reference RelayImitationLearning checkpoint -> RILNet params
    (relay_imitation_learning.py:55-91 upstream: shared perceptual + goal
    encoders, Actor high/low-level policies; the high-level 'action' is a
    goal embedding so its policy head is continuous-only)."""
    modalities = modalities or ["rgb_static"]
    return {
        "perceptual_encoder": _convert_late_fusion(
            sd, "perceptual_encoder.", modalities
        ),
        "goal_encoder": convert_goal_encoder(sd, "goal_encoder."),
        "high_level_policy": {
            "policy": convert_mlp_policy(
                sd, "high_level_policy.policy.", hl_num_layers, False
            )
        },
        "low_level_policy": {
            "policy": convert_mlp_policy(
                sd, "low_level_policy.policy.", ll_num_layers,
                ll_discrete_gripper,
            )
        },
    }


def load_lightning_state_dict(ckpt_path) -> Dict[str, np.ndarray]:
    """Read a PyTorch-Lightning .ckpt and return its (numpy) state_dict."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: to_np(v) for k, v in sd.items()}


def convert_action_decoder_logistic(
    sd: Mapping, prefix: str = "", num_layers: int = 2,
    rnn_type: str = "rnn", discrete_gripper: bool = True,
) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "rnn": convert_rnn(sd, f"{prefix}rnn.", num_layers, rnn_type),
        "mean_fc": convert_linear(sd, f"{prefix}mean_fc."),
        "log_scale_fc": convert_linear(sd, f"{prefix}log_scale_fc."),
        "prob_fc": convert_linear(sd, f"{prefix}prob_fc."),
    }
    if discrete_gripper:
        out["gripper_fc"] = convert_linear(sd, f"{prefix}gripper_fc.")
    return out
