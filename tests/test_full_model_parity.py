"""Full-model torch->flax conversion parity for the four released model
families (reference README.md:98-104: play_lmp, tacorl, cql, ril weights in
tacorl_calvin.zip). Each test random-inits a torch module with the
reference's state_dict layout (tests/torch_ref.py), converts it with
utils/torch_convert.py, and asserts the end-to-end forwards agree — the
hermetic stand-in for success-rate parity runs (VERDICT.md round-1 item 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.utils.torch_convert import (
    assemble_cql,
    assemble_play_lmp,
    assemble_ril,
    assemble_tacorl,
)

torch = pytest.importorskip("torch")

from torch_ref import (  # noqa: E402
    TRIL,
    build_cql_torch,
)

MODS = ["rgb_static"]
HW = 48  # conv stack leaves a 2x2 ssam grid (keypoints actually vary)

ENC_CFG = {
    "networks": {
        "rgb_static": {
            "_target_": "tacorl_tpu.networks.encoders.LMPVisionEncoder",
            "latent_dim": 8,
            "hidden_dim": 16,
            "compute_dtype": None,  # fp32 for exact parity checks
        }
    }
}


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _obs_pair(rs, b=3):
    """(torch NCHW dict, flax NHWC dict) with identical pixels."""
    frames = {
        "observation": rs.rand(b, HW, HW, 3).astype(np.float32),
        "goal": rs.rand(b, HW, HW, 3).astype(np.float32),
    }
    t_obs = {
        k: {"rgb_static": torch.tensor(v.transpose(0, 3, 1, 2))}
        for k, v in frames.items()
    }
    j_obs = {k: {"rgb_static": jnp.asarray(v)} for k, v in frames.items()}
    return t_obs, j_obs


def _cql_module(action_dim=7, discrete_gripper=True, plan_space=False):
    from tacorl_tpu.modules.cql import CQLModule

    return CQLModule({
        "action_dim": action_dim,
        "obs_modalities": MODS,
        "goal_modalities": MODS,
        "actor_encoder": ENC_CFG,
        "critic_encoder": ENC_CFG,
        "goal_encoder": {"hidden_size": 16},
        "policy": {"num_layers": 2, "hidden_dim": 16,
                   "discrete_gripper": discrete_gripper and not plan_space},
        "q_network": {"num_layers": 2, "hidden_dim": 16},
        "with_lagrange": True,
        "n_action_samples": 2,
        "transforms": None,
    })


def test_cql_full_model_parity(rng):
    t_model = build_cql_torch(MODS, action_dim=7)
    params, aux = assemble_cql(
        _sd(t_model), MODS, policy_num_layers=2, q_num_layers=2
    )
    module = _cql_module()

    rs = np.random.RandomState(0)
    t_obs, j_obs = _obs_pair(rs)
    actions = rs.uniform(-1, 1, (3, 7)).astype(np.float32)

    with torch.no_grad():
        t_action = t_model.actor.deterministic_action(t_obs).numpy()
        t_q1 = t_model.q1(t_obs, torch.tensor(actions)).numpy()
        t_q2 = t_model.q2(t_obs, torch.tensor(actions)).numpy()
        t_tq1 = t_model.target_q1(t_obs, torch.tensor(actions)).numpy()

    j_action, _ = module.actor_net.apply(
        {"params": params["actor"]}, j_obs, None, True, False,
        method="get_actions",
    )
    np.testing.assert_allclose(np.asarray(j_action), t_action, atol=1e-4)
    for tree, expected in ((params["q1"], t_q1), (params["q2"], t_q2),
                           (aux["target_q1"], t_tq1)):
        q = module.critic_net.apply(
            {"params": tree}, j_obs, jnp.asarray(actions)
        )
        np.testing.assert_allclose(np.asarray(q), expected, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(params["log_alpha"]),
        t_model.log_alpha.detach().numpy(),
    )


def test_cql_converted_params_load_into_train_state(rng):
    """The converted tree must be exactly init_state's tree (same leaves,
    same shapes) so checkpoints restore without surgery."""
    t_model = build_cql_torch(MODS, action_dim=7)
    params, aux = assemble_cql(
        _sd(t_model), MODS, policy_num_layers=2, q_num_layers=2
    )
    module = _cql_module()
    rs = np.random.RandomState(1)
    batch = {
        "observations": {
            "observation": {"rgb_static": rs.rand(2, HW, HW, 3).astype(np.float32)},
            "goal": {"rgb_static": rs.rand(2, HW, HW, 3).astype(np.float32)},
        },
        "next_observations": {
            "observation": {"rgb_static": rs.rand(2, HW, HW, 3).astype(np.float32)},
            "goal": {"rgb_static": rs.rand(2, HW, HW, 3).astype(np.float32)},
        },
        "actions": rs.randn(2, 7).astype(np.float32),
        "rewards": np.zeros(2, np.float32),
        "dones": np.zeros(2, np.float32),
    }
    state = module.init_state(rng, batch)
    ref_paths = {jax.tree_util.keystr(p): v.shape
                 for p, v in jax.tree_util.tree_flatten_with_path(state.params)[0]}
    got_paths = {jax.tree_util.keystr(p): np.shape(v)
                 for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths
    ref_aux = {jax.tree_util.keystr(p): v.shape
               for p, v in jax.tree_util.tree_flatten_with_path(state.aux)[0]}
    got_aux = {jax.tree_util.keystr(p): np.shape(v)
               for p, v in jax.tree_util.tree_flatten_with_path(aux)[0]}
    assert ref_aux == got_aux


def test_ril_full_model_parity(rng):
    t_model = TRIL(MODS, goal_out=8)
    params = assemble_ril(
        _sd(t_model), MODS, hl_num_layers=2, ll_num_layers=2,
        ll_discrete_gripper=False,
    )

    from tacorl_tpu.modules.ril import RILModule

    module = RILModule({
        "perceptual_encoder": ENC_CFG,
        "goal_encoder": {"hidden_size": 16, "out_features": 8},
        "high_level_policy": {"num_layers": 2, "hidden_dim": 16},
        "low_level_policy": {"num_layers": 2, "hidden_dim": 16},
        "action_dim": 7,
        "transforms": None,
    })

    rs = np.random.RandomState(0)
    t_obs, j_obs = _obs_pair(rs)
    obs_t, goal_t = t_obs["observation"], t_obs["goal"]
    obs_j, goal_j = j_obs["observation"], j_obs["goal"]

    with torch.no_grad():
        state_emb = t_model.perceptual_encoder.encode(obs_t, MODS)
        goal_emb = t_model.goal_encoder(
            t_model.perceptual_encoder.encode(goal_t, MODS)
        )
        hl_in = torch.cat([state_emb, goal_emb], dim=-1)
        t_subgoal = t_model.high_level_policy.deterministic_action(hl_in)
        ll_in = torch.cat([state_emb, t_subgoal], dim=-1)
        t_action = t_model.low_level_policy.deterministic_action(ll_in).numpy()

    j_subgoal = module.net.apply(
        {"params": params}, obs_j, goal_j, method="high_level_action"
    )
    np.testing.assert_allclose(
        np.asarray(j_subgoal), t_subgoal.numpy(), atol=1e-4
    )
    j_action = module.net.apply(
        {"params": params}, obs_j, j_subgoal, method="low_level_action"
    )
    np.testing.assert_allclose(np.asarray(j_action), t_action, atol=1e-4)


# -- Play-LMP / TACO-RL families ------------------------------------------

from torch_ref import TPlayLMP  # noqa: E402

LP = 8  # latent plan dim == TACORL's plan-space action dim


def _play_lmp_pieces():
    """Our standalone flax submodules matching TPlayLMP's hyperparams."""
    from tacorl_tpu.networks.action_decoder import ActionDecoderLogistic
    from tacorl_tpu.networks.actor import Actor, MLPPolicy
    from tacorl_tpu.networks.plan_recognition import PlanRecognitionTransformer

    pr = PlanRecognitionTransformer(
        state_dim=8, latent_plan_dim=LP, num_heads=4, num_layers=1,
        encoder_hidden_size=16, fc_hidden_size=16, dropout_p=0.0,
    )
    pp = Actor(policy=MLPPolicy(action_dim=LP, num_layers=2, hidden_dim=16),
               action_dim=LP)
    ad = ActionDecoderLogistic(
        state_dim=8, latent_plan_dim=LP, hidden_size=16, num_layers=1,
        out_features=7, n_mixtures=4, rnn_model="rnn_decoder",
        discrete_gripper=True,
    )
    return pr, pp, ad


def _frame_embs(t_model, rs, b=2, t=5):
    """Identical random pixel windows -> (torch embs, flax params+inputs)."""
    frames = rs.rand(b, t, HW, HW, 3).astype(np.float32)
    goal = rs.rand(b, HW, HW, 3).astype(np.float32)
    with torch.no_grad():
        t_emb = t_model.perceptual_encoder.networks["rgb_static"](
            torch.tensor(frames.reshape(b * t, HW, HW, 3).transpose(0, 3, 1, 2))
        ).view(b, t, -1)
        t_goal_raw = t_model.perceptual_encoder.networks["rgb_static"](
            torch.tensor(goal.transpose(0, 3, 1, 2))
        )
        t_goal = t_model.goal_encoder(t_goal_raw)
    return frames, goal, t_emb, t_goal


def test_play_lmp_full_model_parity(rng):
    from tacorl_tpu.networks.encoders import LMPVisionEncoder
    from tacorl_tpu.networks.goal_encoder import VisualGoalEncoder

    t_model = TPlayLMP(MODS)
    params = assemble_play_lmp(
        _sd(t_model), MODS, pp_num_layers=2, pr_num_layers=1, pr_num_heads=4,
        ad_num_layers=1, ad_rnn_type="rnn", discrete_gripper=True,
    )
    pr, pp, ad = _play_lmp_pieces()
    enc = LMPVisionEncoder(latent_dim=8, hidden_dim=16, compute_dtype=None)
    goal_enc = VisualGoalEncoder(out_features=8, hidden_size=16)

    rs = np.random.RandomState(0)
    frames, goal, t_emb, t_goal = _frame_embs(t_model, rs)
    b, t = frames.shape[:2]

    # 1. per-frame perceptual embeddings
    j_emb = enc.apply(
        {"params": params["perceptual_encoder"]["encoders_0_1"]},
        jnp.asarray(frames.reshape(b * t, HW, HW, 3)),
    ).reshape(b, t, -1)
    np.testing.assert_allclose(np.asarray(j_emb), t_emb.numpy(), atol=1e-4)

    # 2. goal encoder
    j_goal = goal_enc.apply(
        {"params": params["goal_encoder"]},
        enc.apply(
            {"params": params["perceptual_encoder"]["encoders_0_1"]},
            jnp.asarray(goal),
        ),
    )
    np.testing.assert_allclose(np.asarray(j_goal), t_goal.numpy(), atol=1e-4)

    # 3. plan recognition posterior
    with torch.no_grad():
        t_mean, t_std = t_model.plan_recognition(t_emb)
    j_dist = pr.apply({"params": params["plan_recognition"]}, j_emb)
    np.testing.assert_allclose(np.asarray(j_dist.mean), t_mean.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_dist.std), t_std.numpy(), atol=1e-4)

    # 4. plan proposal prior (state0 + goal)
    pp_in = torch.cat([t_emb[:, 0], t_goal], dim=-1)
    with torch.no_grad():
        p_mean, p_std = t_model.plan_proposal.policy(pp_in)
    j_pp = pp.apply(
        {"params": params["plan_proposal"]}, j_emb[:, 0], j_goal,
        method="get_dist",
    )
    np.testing.assert_allclose(np.asarray(j_pp.mean), p_mean.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_pp.std), p_std.numpy(), atol=1e-4)

    # 5. action decoder mixture heads
    plan = rs.randn(b, LP).astype(np.float32)
    with torch.no_grad():
        t_lp, t_ls, t_mu, t_grip = t_model.action_decoder(
            torch.tensor(plan), t_emb
        )
    j_lp, j_ls, j_mu, j_grip, _ = ad.apply(
        {"params": params["action_decoder"]}, jnp.asarray(plan), j_emb
    )
    np.testing.assert_allclose(np.asarray(j_lp), t_lp.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ls), t_ls.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mu), t_mu.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_grip), t_grip.numpy(), atol=1e-4)


def test_tacorl_full_model_parity(rng):
    """TACORL = CQL tree (plan-space continuous actor) + frozen play-lmp
    parts at top level (tacorl.py:46-117 upstream)."""
    import torch.nn as tnn

    from torch_ref import build_cql_torch

    t_lmp = TPlayLMP(MODS)
    t_cql = build_cql_torch(MODS, action_dim=LP, plan_space=True)

    class TTACORL(tnn.Module):
        def __init__(self):
            super().__init__()
            self.actor = t_cql.actor
            self.q1, self.q2 = t_cql.q1, t_cql.q2
            self.target_q1, self.target_q2 = t_cql.target_q1, t_cql.target_q2
            self.log_alpha = t_cql.log_alpha
            self.log_alpha_prime = t_cql.log_alpha_prime
            self.perceptual_encoder = t_lmp.perceptual_encoder
            self.plan_recognition = t_lmp.plan_recognition
            self.goal_encoder = t_lmp.goal_encoder
            self.action_decoder = t_lmp.action_decoder

    t_model = TTACORL()
    params, aux = assemble_tacorl(
        _sd(t_model), MODS, policy_num_layers=2, q_num_layers=2,
        pr_num_layers=1, pr_num_heads=4, ad_num_layers=1,
    )
    module = _cql_module(action_dim=LP, plan_space=True)

    rs = np.random.RandomState(0)
    t_obs, j_obs = _obs_pair(rs)
    plans = rs.uniform(-1, 1, (3, LP)).astype(np.float32)

    # plan-space actor + critics (the RL surface)
    with torch.no_grad():
        t_plan = t_model.actor.deterministic_action(t_obs).numpy()
        t_q1 = t_model.q1(t_obs, torch.tensor(plans)).numpy()
    j_plan, _ = module.actor_net.apply(
        {"params": params["actor"]}, j_obs, None, True, False,
        method="get_actions",
    )
    np.testing.assert_allclose(np.asarray(j_plan), t_plan, atol=1e-4)
    j_q1 = module.critic_net.apply(
        {"params": params["q1"]}, j_obs, jnp.asarray(plans)
    )
    np.testing.assert_allclose(np.asarray(j_q1), t_q1, atol=1e-4)

    # frozen play-lmp parts (decode path used at rollout time)
    pr, _, ad = _play_lmp_pieces()
    frames, _, t_emb, _ = _frame_embs(t_lmp, rs)
    from tacorl_tpu.networks.encoders import LMPVisionEncoder

    enc = LMPVisionEncoder(latent_dim=8, hidden_dim=16, compute_dtype=None)
    b, t = frames.shape[:2]
    j_emb = enc.apply(
        {"params": params["perceptual_encoder"]["encoders_0_1"]},
        jnp.asarray(frames.reshape(b * t, HW, HW, 3)),
    ).reshape(b, t, -1)
    np.testing.assert_allclose(np.asarray(j_emb), t_emb.numpy(), atol=1e-4)
    with torch.no_grad():
        t_lp, _, t_mu, t_grip = t_model.action_decoder(
            torch.tensor(plans[:2]), t_emb
        )
    j_lp, _, j_mu, j_grip, _ = ad.apply(
        {"params": params["action_decoder"]}, jnp.asarray(plans[:2]), j_emb
    )
    np.testing.assert_allclose(np.asarray(j_mu), t_mu.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_grip), t_grip.numpy(), atol=1e-4)


@pytest.mark.slow
def test_convert_checkpoint_script_end_to_end(tmp_path, rng):
    """scripts/convert_checkpoint.py --kind cql: torch .ckpt on disk ->
    our checkpoint dir -> restore -> same Q values as the torch source."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import convert_checkpoint

    t_model = build_cql_torch(MODS, action_dim=7)
    ckpt_path = tmp_path / "cql.ckpt"
    torch.save({"state_dict": t_model.state_dict()}, ckpt_path)

    module_cfg = {
        "_target_": "tacorl_tpu.modules.cql.CQLModule",
        "action_dim": 7,
        "obs_modalities": MODS,
        "goal_modalities": MODS,
        "actor_encoder": ENC_CFG,
        "critic_encoder": ENC_CFG,
        "goal_encoder": {"hidden_size": 16},
        "policy": {"num_layers": 2, "hidden_dim": 16, "discrete_gripper": True},
        "q_network": {"num_layers": 2, "hidden_dim": 16},
        "with_lagrange": True,
        "n_action_samples": 2,
        "transforms": None,
    }
    from tacorl_tpu.config import save_yaml

    cfg_path = tmp_path / "module.yaml"
    save_yaml({"module": module_cfg}, cfg_path)

    out_dir = tmp_path / "converted"
    argv = sys.argv
    sys.argv = ["convert_checkpoint.py", "--ckpt", str(ckpt_path),
                "--module-config", str(cfg_path), "--out", str(out_dir),
                "--kind", "cql"]
    try:
        convert_checkpoint.main()
    finally:
        sys.argv = argv

    from tacorl_tpu.core.checkpoint import load_module_from_checkpoint

    module, state = load_module_from_checkpoint(out_dir)
    rs = np.random.RandomState(3)
    t_obs, j_obs = _obs_pair(rs)
    actions = rs.uniform(-1, 1, (3, 7)).astype(np.float32)
    with torch.no_grad():
        t_q1 = t_model.q1(t_obs, torch.tensor(actions)).numpy()
    j_q1 = module.critic_net.apply(
        {"params": state.params["q1"]}, j_obs, jnp.asarray(actions)
    )
    np.testing.assert_allclose(np.asarray(j_q1), t_q1, atol=1e-4)
