import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.core.distributions import DiagNormal, TanhNormal
from tacorl_tpu.networks.action_decoder import (
    ActionDecoderGaussian,
    ActionDecoderLogistic,
    StackedRNN,
)
from tacorl_tpu.networks.actor import Actor, D2RLPolicy, DenseNetPolicy, MLPPolicy
from tacorl_tpu.networks.critic import Critic, D2RLQNetwork, MLPQNetwork
from tacorl_tpu.networks.encoders import (
    LMPVisionEncoder,
    ResNetRLEncoder,
    SpatialSoftArgmax,
)
from tacorl_tpu.networks.goal_encoder import VisualGoalEncoder
from tacorl_tpu.networks.late_fusion import build_late_fusion
from tacorl_tpu.networks.plan_recognition import (
    PlanRecognitionBiRNN,
    PlanRecognitionTransformer,
)
from tacorl_tpu.networks.visual_wrappers import (
    VisualActorWrapper,
    VisualCriticWrapper,
)


def test_spatial_softargmax_localizes_peak(rng):
    img = jnp.full((1, 9, 11, 2), -20.0)
    img = img.at[0, 3, 7, 0].set(20.0)
    img = img.at[0, 5, 2, 1].set(20.0)
    mod = SpatialSoftArgmax(temperature=0.1)
    out, _ = mod.init_with_output(rng, img)
    # interleaved (x, y) per channel; unnormalized pixel coordinates
    np.testing.assert_allclose(np.asarray(out[0]), [7.0, 3.0, 2.0, 5.0], atol=1e-2)


def test_spatial_softargmax_normalized(rng):
    img = jnp.full((1, 9, 9, 1), -20.0)
    img = img.at[0, 8, 0].set(20.0)
    mod = SpatialSoftArgmax(temperature=0.1, normalize=True)
    out, _ = mod.init_with_output(rng, img)
    np.testing.assert_allclose(np.asarray(out[0]), [-1.0, 1.0], atol=1e-2)


def test_lmp_vision_encoder_shapes(rng):
    enc = LMPVisionEncoder(latent_dim=32)
    x = jnp.zeros((2, 128, 128, 3))
    out, params = enc.init_with_output(rng, x)
    assert out.shape == (2, 32)
    assert out.dtype == jnp.float32


def test_lmp_vision_encoder_vib(rng):
    enc = LMPVisionEncoder(latent_dim=16, vib=True)
    x = jnp.zeros((2, 84, 84, 3))
    variables = enc.init({"params": rng, "sample": rng}, x)
    dist = enc.apply(variables, x, method="get_dist")
    assert isinstance(dist, DiagNormal) and dist.mean.shape == (2, 16)


def test_resnet_rl_encoder(rng):
    enc = ResNetRLEncoder(latent_dim=32, hidden_channels=32, num_residual_blocks=1)
    out, _ = enc.init_with_output(rng, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 32)


def test_goal_encoder(rng):
    mod = VisualGoalEncoder(out_features=32)
    out, _ = mod.init_with_output(rng, jnp.zeros((4, 32)))
    assert out.shape == (4, 32)


def test_plan_recognition_transformer_pads_heads(rng):
    # state_dim=33 not divisible by 8 heads -> zero-pad to 40
    net = PlanRecognitionTransformer(
        state_dim=33, latent_plan_dim=16, encoder_hidden_size=64,
        fc_hidden_size=64, max_position_embeddings=16,
    )
    x = jnp.zeros((2, 8, 33))
    dist, _ = net.init_with_output({"params": rng}, x)
    assert isinstance(dist, TanhNormal)
    assert dist.mean.shape == (2, 16)
    assert float(jnp.min(dist.std)) >= net.min_std


def test_plan_recognition_transformer_variable_window(rng):
    net = PlanRecognitionTransformer(
        state_dim=32, latent_plan_dim=8, encoder_hidden_size=32,
        fc_hidden_size=32, max_position_embeddings=16,
    )
    variables = net.init({"params": rng}, jnp.zeros((1, 16, 32)))
    for s in (8, 12, 16):
        dist = net.apply(variables, jnp.zeros((3, s, 32)))
        assert dist.mean.shape == (3, 8)


def test_plan_recognition_birnn(rng):
    net = PlanRecognitionBiRNN(
        state_dim=16, latent_plan_dim=8, hidden_size=32, num_layers=2
    )
    dist, _ = net.init_with_output(rng, jnp.zeros((2, 8, 16)))
    assert isinstance(dist, DiagNormal) and dist.mean.shape == (2, 8)


@pytest.mark.parametrize("policy_cls", [MLPPolicy, D2RLPolicy, DenseNetPolicy])
def test_actor_policies(rng, policy_cls):
    actor = Actor(
        policy=policy_cls(action_dim=7, hidden_dim=32), action_dim=7,
        state_dim=10, goal_dim=0,
    )
    obs = jnp.zeros((4, 10))
    variables = actor.init(rng, obs)
    a, lp = actor.apply(
        variables, obs, jax.random.key(1), method="get_actions"
    )
    assert a.shape == (4, 7) and lp.shape == (4, 1)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)
    a_det, lp_det = actor.apply(
        variables, obs, None, True, method="get_actions"
    )
    assert float(jnp.abs(lp_det).max()) == 0.0
    n_a, n_lp = actor.apply(
        variables, obs, jax.random.key(2), 5, method="sample_n_with_log_prob"
    )
    assert n_a.shape == (5, 4, 7) and n_lp.shape == (5, 4, 1)
    lp2 = actor.apply(variables, obs, a, method="log_prob")
    assert lp2.shape == (4, 1)


def test_actor_discrete_gripper(rng):
    actor = Actor(
        policy=MLPPolicy(action_dim=7, hidden_dim=32, discrete_gripper=True),
        action_dim=7, discrete_gripper=True,
    )
    obs = jnp.zeros((4, 10))
    variables = actor.init(rng, obs)
    a, lp = actor.apply(
        variables, obs, jax.random.key(1), False, True, method="get_actions"
    )
    assert a.shape == (4, 7)
    assert set(np.asarray(a[:, -1]).tolist()) <= {-1.0, 1.0}
    n_a, n_lp = actor.apply(
        variables, obs, jax.random.key(2), 3, method="sample_n_with_log_prob"
    )
    assert n_a.shape == (3, 4, 7) and n_lp.shape == (3, 4, 1)


def test_actor_reparameterize_controls_gradient(rng):
    actor = Actor(policy=MLPPolicy(action_dim=3, hidden_dim=16), action_dim=3)
    obs = jnp.ones((2, 5))
    variables = actor.init(rng, obs)

    def mean_action(params, reparam):
        a, _ = actor.apply(
            {"params": params}, obs, jax.random.key(0), False, reparam,
            method="get_actions",
        )
        return a.sum()

    g_r = jax.grad(mean_action)(variables["params"], True)
    g_s = jax.grad(mean_action)(variables["params"], False)
    norm_r = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_r))
    norm_s = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_s))
    assert norm_r > 0.0 and norm_s == 0.0


@pytest.mark.parametrize("q_cls", [MLPQNetwork, D2RLQNetwork])
def test_critic(rng, q_cls):
    critic = Critic(q_network=q_cls(hidden_dim=32))
    out, _ = critic.init_with_output(rng, jnp.zeros((4, 10)), jnp.zeros((4, 7)))
    assert out.shape == (4, 1)


def test_stacked_rnn_carry_streaming(rng):
    for rnn_type in ("rnn", "gru", "lstm"):
        rnn = StackedRNN(rnn_type, hidden_size=16, num_layers=2)
        x = jax.random.normal(rng, (2, 6, 8))
        variables = rnn.init(rng, x)
        full, _ = rnn.apply(variables, x)
        # streaming: feed two halves with carry
        h1, c = rnn.apply(variables, x[:, :3])
        h2, _ = rnn.apply(variables, x[:, 3:], c)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([h1, h2], axis=1)),
            np.asarray(full),
            rtol=1e-5,
            atol=1e-5,
        )


def test_stacked_rnn_hoisted_matches_flax_cell(rng):
    """The hoisted input-projection path is a pure execution strategy: same
    param tree, bit-close outputs vs the nn.RNN(SimpleCell) path."""
    x = jax.random.normal(rng, (2, 6, 8))
    hoisted = StackedRNN("rnn", hidden_size=16, num_layers=2, hoisted=True)
    legacy = StackedRNN("rnn", hidden_size=16, num_layers=2, hoisted=False)
    variables = hoisted.init(rng, x)
    legacy_vars = legacy.init(rng, x)
    assert jax.tree.structure(variables) == jax.tree.structure(legacy_vars)
    out_h, carry_h = hoisted.apply(variables, x)
    out_l, carry_l = legacy.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_h), np.asarray(out_l), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jnp.stack(list(carry_h))),
        np.asarray(jnp.stack(list(carry_l))),
        rtol=1e-6, atol=1e-6,
    )


def test_stacked_rnn_bf16_matmul_close_to_f32(rng):
    """Mixed-precision recurrence (bf16 matmuls, f32 carry) must track the
    f32 path to bf16 resolution."""
    x = jax.random.normal(rng, (2, 6, 8))
    f32 = StackedRNN("rnn", hidden_size=16, num_layers=2)
    mixed = StackedRNN("rnn", hidden_size=16, num_layers=2, bf16_matmul=True)
    variables = f32.init(rng, x)
    out32, _ = f32.apply(variables, x)
    out16, _ = mixed.apply(variables, x)
    assert out16.dtype == jnp.float32  # carry/output stay f32
    np.testing.assert_allclose(
        np.asarray(out32), np.asarray(out16), rtol=0, atol=0.05
    )


def test_action_decoder_logistic_loss_and_streaming(rng):
    dec = ActionDecoderLogistic(
        state_dim=12, latent_plan_dim=4, hidden_size=32, out_features=7,
        num_layers=2, discrete_gripper=True,
    )
    plan = jax.random.normal(rng, (2, 4))
    emb = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 12))
    actions = jnp.clip(
        jax.random.normal(jax.random.fold_in(rng, 2), (2, 5, 7)), -1, 1
    )
    actions = actions.at[..., -1].set(jnp.sign(actions[..., -1]) + (actions[..., -1] == 0))
    variables = dec.init(rng, plan, emb)
    loss = dec.apply(variables, plan, emb, actions, method="loss")
    assert np.isfinite(float(loss))
    loss2, pred = dec.apply(
        variables, jax.random.key(3), plan, emb, actions, method="loss_and_act"
    )
    assert pred.shape == (2, 5, 7)
    assert set(np.asarray(pred[..., -1]).ravel().tolist()) <= {-1.0, 1.0}
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)

    # streaming act: parameters of step t from split calls match full fwd
    full = dec.apply(variables, plan, emb)
    lp_f, ls_f, m_f, g_f, _ = full
    out1 = dec.apply(variables, plan, emb[:, :2])
    carry = out1[4]
    out2 = dec.apply(variables, plan, emb[:, 2:], carry=carry)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([out1[2], out2[2]], axis=1)),
        np.asarray(m_f),
        rtol=1e-4, atol=1e-5,
    )


def test_action_decoder_logistic_grad(rng):
    dec = ActionDecoderLogistic(
        state_dim=8, latent_plan_dim=4, hidden_size=16, out_features=7
    )
    plan = jnp.zeros((2, 4))
    emb = jnp.zeros((2, 3, 8))
    actions = jnp.zeros((2, 3, 7))
    variables = dec.init(rng, plan, emb)

    def loss_fn(p):
        return dec.apply({"params": p}, plan, emb, actions, method="loss")

    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_action_decoder_gaussian(rng):
    dec = ActionDecoderGaussian(
        state_dim=8, latent_plan_dim=4, hidden_size=16, out_features=7,
        include_goal=True, goal_dim=6,
    )
    plan = jnp.zeros((2, 4))
    emb = jnp.zeros((2, 3, 8))
    goal = jnp.zeros((2, 6))
    actions = jnp.zeros((2, 3, 7))
    variables = dec.init(rng, plan, emb, goal)
    loss = dec.apply(variables, plan, emb, actions, goal, method="loss")
    assert np.isfinite(float(loss))
    act, carry = dec.apply(
        variables, jax.random.key(1), plan, emb[:, :1], goal, method="act"
    )
    assert act.shape == (2, 1, 7)


def _fusion():
    return build_late_fusion(
        networks={
            "rgb_static": {
                "_target_": "tacorl_tpu.networks.encoders.LMPVisionEncoder",
                "latent_dim": 16,
                "hidden_dim": 32,
            }
        },
        modalities=["rgb_static", "robot_obs"],
        vector_dims={"robot_obs": 15},
    )


def test_late_fusion_encode(rng):
    fusion = _fusion()
    obs = {
        "rgb_static": jnp.zeros((2, 84, 84, 3)),
        "robot_obs": jnp.zeros((2, 15)),
    }
    out, variables = fusion.init_with_output(
        rng, obs, ["rgb_static", "robot_obs"]
    )
    assert out.shape == (2, 31)
    assert fusion.calc_state_dim(["rgb_static", "robot_obs"]) == 31
    d = fusion.apply(variables, obs, ["rgb_static"], False, method="encode")
    assert d["rgb_static"].shape == (2, 16)


def test_visual_wrappers_end_to_end(rng):
    fusion = _fusion()
    actor = VisualActorWrapper(
        encoder=fusion,
        goal_encoder=VisualGoalEncoder(out_features=16, hidden_size=32),
        env_modalities=("rgb_static", "robot_obs"),
        goal_modalities=("rgb_static",),
        actor=Actor(
            policy=MLPPolicy(action_dim=16, hidden_dim=32), action_dim=16
        ),
    )
    obs = {
        "observation": {
            "rgb_static": jnp.zeros((2, 84, 84, 3)),
            "robot_obs": jnp.zeros((2, 15)),
        },
        "goal": {"rgb_static": jnp.zeros((2, 84, 84, 3))},
    }
    variables = actor.init(rng, obs)
    a, lp = actor.apply(
        variables, obs, jax.random.key(1), method="get_actions"
    )
    assert a.shape == (2, 16)

    critic = VisualCriticWrapper(
        encoder=_fusion(),
        goal_encoder=VisualGoalEncoder(out_features=16, hidden_size=32),
        env_modalities=("rgb_static", "robot_obs"),
        goal_modalities=("rgb_static",),
        critic=Critic(q_network=MLPQNetwork(hidden_dim=32)),
    )
    cv = critic.init(rng, obs, a)
    q = critic.apply(cv, obs, a)
    assert q.shape == (2, 1)


@pytest.mark.slow  # ~45 s jit of the full ResNet18 backbone
def test_resnet18_encoder(rng):
    from tacorl_tpu.networks.resnet import R3MEncoder, ResNet18Encoder

    enc = ResNet18Encoder(latent_dim=16, width=8)
    x = jnp.zeros((2, 64, 64, 3))
    variables = enc.init(rng, x, train=True)
    assert "batch_stats" in variables
    out, _mut = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 16)
    out_eval = enc.apply(variables, x, train=False)
    assert out_eval.shape == (2, 16)

    r3m = R3MEncoder(latent_dim=16, hidden_dim=32, backbone_latent=32)
    variables = r3m.init(rng, x)
    out = r3m.apply(variables, x)
    assert out.shape == (2, 16)
    # backbone gradient is stopped
    def loss(params):
        return r3m.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, x).sum()
    g = jax.grad(loss)(variables["params"])
    backbone_norm = sum(
        float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["backbone"])
    )
    head_norm = float(jnp.abs(g["head1"]["kernel"]).sum())
    assert backbone_norm == 0.0 and head_norm > 0.0


def test_custom_encoder_variants(rng):
    from tacorl_tpu.networks.encoders import CustomEncoder

    enc = CustomEncoder(
        latent_dim=8, conv_channels=(8, 16), kernel_sizes=(4, 3),
        strides=(2, 1), paddings=(0, 0), hidden_dim=16, max_pool=True,
        normalize_output=True,
    )
    out, _ = enc.init_with_output(rng, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 8)

    vib = CustomEncoder(
        latent_dim=8, conv_channels=(8,), kernel_sizes=(4,), strides=(2,),
        paddings=(0,), vib=True,
    )
    variables = vib.init({"params": rng, "sample": rng}, jnp.zeros((2, 16, 16, 3)))
    out = vib.apply(variables, jnp.zeros((2, 16, 16, 3)), rngs={"sample": rng})
    assert out.shape == (2, 8)


def test_deep_spatial_encoder(rng):
    from tacorl_tpu.networks.encoders import DeepSpatialEncoder

    enc = DeepSpatialEncoder()
    x = jnp.zeros((2, 48, 48, 3))
    variables = enc.init(rng, x, train=True)
    out, _ = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 32)  # 16 channels x 2 coords
