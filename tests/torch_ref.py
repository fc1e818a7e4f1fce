"""Hermetic PyTorch replicas of the reference networks, with the reference's
exact ``state_dict`` key layout (attribute names follow
networks/actor_critic/*.py, visual_encoders/*.py upstream). Used by
test_full_model_parity.py to prove that ``utils/torch_convert.py`` maps a
released-checkpoint-shaped state_dict onto our param trees such that the
full-model forwards agree numerically.

These are replicas written from the reference's documented math (silu MLP
trunks, clamped mean/log-std heads, spatial soft-argmax keypoints), not
copies: only the state_dict KEY NAMES must match upstream for the converter
to be exercised realistically.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

LOG_SIG_MIN, LOG_SIG_MAX = -5.0, 2.0
MEAN_MIN, MEAN_MAX = -9.0, 9.0


class TSpatialSoftArgmax(nn.Module):
    """(N, C, H, W) -> (N, 2C) interleaved (x, y) keypoints."""

    def __init__(self, temperature=None, normalize=False):
        super().__init__()
        self.temperature = (
            nn.Parameter(torch.ones(1))
            if temperature is None
            else torch.tensor([temperature])
        )
        self.normalize = normalize

    def forward(self, x):
        n, c, h, w = x.shape
        sm = F.softmax(x.reshape(n * c, h * w) / self.temperature, dim=1)
        sm = sm.view(n, c, h, w)
        x_range = torch.arange(w, dtype=torch.float32)
        y_range = torch.arange(h, dtype=torch.float32)
        if self.normalize:
            x_range = (x_range / (w - 1)) * 2 - 1
            y_range = (y_range / (h - 1)) * 2 - 1
        ex = torch.einsum("nchw,w->nc", sm, x_range)
        ey = torch.einsum("nchw,h->nc", sm, y_range)
        return torch.stack([ex, ey], dim=-1).view(n, 2 * c)


class TLMPVisionEncoder(nn.Module):
    """state_dict keys: model.{0,2,4}.*, model.6.temperature,
    fc_layers.{0,3}.* (encoder.py:349-428 upstream)."""

    def __init__(self, latent_dim=8, hidden_dim=16):
        super().__init__()
        self.model = nn.Sequential(
            nn.Conv2d(3, 32, kernel_size=8, stride=4),
            nn.ReLU(),
            nn.Conv2d(32, 64, kernel_size=4, stride=2),
            nn.ReLU(),
            nn.Conv2d(64, 64, kernel_size=3, stride=1),
            nn.ReLU(),
            TSpatialSoftArgmax(),
            nn.Flatten(),
        )
        self.fc_layers = nn.Sequential(
            nn.Linear(128, hidden_dim),
            nn.ReLU(),
            nn.Dropout(0.0),
            nn.Linear(hidden_dim, latent_dim),
        )

    def forward(self, x):  # NCHW
        return self.fc_layers(self.model(x))


class TLateFusion(nn.Module):
    """state_dict keys: networks.<modality>.*"""

    def __init__(self, modalities, latent_dim=8, hidden_dim=16):
        super().__init__()
        self.modalities = list(modalities)
        self.networks = nn.ModuleDict(
            {m: TLMPVisionEncoder(latent_dim, hidden_dim) for m in modalities}
        )

    def encode(self, obs, modalities):
        return torch.cat(
            [self.networks[m](obs[m]) for m in modalities], dim=-1
        )


class TGoalEncoder(nn.Module):
    """state_dict keys: mlp.{0,2,4}.* (goal_encoder.py:18-24 upstream)."""

    def __init__(self, in_features, out_features, hidden_size=16):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(in_features, hidden_size),
            nn.ReLU(),
            nn.Linear(hidden_size, hidden_size),
            nn.ReLU(),
            nn.Linear(hidden_size, out_features),
        )

    def forward(self, x):
        return self.mlp(x)


class TMLPPolicy(nn.Module):
    """state_dict keys: fc_layers.{i}.*, fc_mean.*, fc_log_std.*,
    gripper_action.* (actor.py:159-226 upstream); silu trunk, clamped heads."""

    def __init__(self, input_dim, action_dim, num_layers=2, hidden_dim=16,
                 discrete_gripper=False):
        super().__init__()
        self.discrete_gripper = discrete_gripper
        cont = action_dim - 1 if discrete_gripper else action_dim
        if discrete_gripper:
            self.gripper_action = nn.Linear(hidden_dim, 2)
        layers = [nn.Linear(input_dim, hidden_dim)]
        layers += [nn.Linear(hidden_dim, hidden_dim) for _ in range(num_layers - 1)]
        self.fc_layers = nn.ModuleList(layers)
        self.fc_mean = nn.Linear(hidden_dim, cont)
        self.fc_log_std = nn.Linear(hidden_dim, cont)

    def forward(self, x):
        for fc in self.fc_layers:
            x = F.silu(fc(x))
        mean = torch.clamp(self.fc_mean(x), MEAN_MIN, MEAN_MAX)
        log_std = torch.clamp(self.fc_log_std(x), LOG_SIG_MIN, LOG_SIG_MAX)
        if self.discrete_gripper:
            return mean, log_std.exp(), self.gripper_action(x)
        return mean, log_std.exp()


class TMLPQNetwork(nn.Module):
    """state_dict keys: fc_layers.{i}.*, out.* (critic.py:73-98 upstream)."""

    def __init__(self, input_dim, num_layers=2, hidden_dim=16):
        super().__init__()
        layers = [nn.Linear(input_dim, hidden_dim)]
        layers += [nn.Linear(hidden_dim, hidden_dim) for _ in range(num_layers - 1)]
        self.fc_layers = nn.ModuleList(layers)
        self.out = nn.Linear(hidden_dim, 1)

    def forward(self, x):
        for fc in self.fc_layers:
            x = F.silu(fc(x))
        return self.out(x)


class TActor(nn.Module):
    """state_dict keys: policy.* (actor.py:18-48 upstream)."""

    def __init__(self, policy):
        super().__init__()
        self.policy = policy

    def deterministic_action(self, x):
        if self.policy.discrete_gripper:
            mean, _, grip_logits = self.policy(x)
            grip = torch.argmax(grip_logits, dim=-1, keepdim=True) * 2.0 - 1
            return torch.cat([torch.tanh(mean), grip], dim=-1)
        mean, _ = self.policy(x)
        return torch.tanh(mean)


class TCritic(nn.Module):
    """state_dict keys: Q.* (critic.py:9-31 upstream)."""

    def __init__(self, q_network):
        super().__init__()
        self.Q = q_network

    def forward(self, obs, action):
        return self.Q(torch.cat([obs, action], dim=-1))


class TVisualActorWrapper(nn.Module):
    """state_dict keys: encoder.*, goal_encoder.*, actor.*"""

    def __init__(self, encoder, goal_encoder, actor, env_modalities,
                 goal_modalities):
        super().__init__()
        self.encoder = encoder
        self.goal_encoder = goal_encoder
        self.actor = actor
        self.env_modalities = env_modalities
        self.goal_modalities = goal_modalities

    def embed(self, obs):
        emb_obs = self.encoder.encode(obs["observation"], self.env_modalities)
        emb_goal = self.goal_encoder(
            self.encoder.encode(obs["goal"], self.goal_modalities)
        )
        return torch.cat([emb_obs, emb_goal], dim=-1)

    def deterministic_action(self, obs):
        return self.actor.deterministic_action(self.embed(obs))


class TVisualCriticWrapper(nn.Module):
    """state_dict keys: encoder.*, goal_encoder.*, critic.*"""

    def __init__(self, encoder, goal_encoder, critic, env_modalities,
                 goal_modalities):
        super().__init__()
        self.encoder = encoder
        self.goal_encoder = goal_encoder
        self.critic = critic
        self.env_modalities = env_modalities
        self.goal_modalities = goal_modalities

    def forward(self, obs, action):
        emb_obs = self.encoder.encode(obs["observation"], self.env_modalities)
        emb_goal = self.goal_encoder(
            self.encoder.encode(obs["goal"], self.goal_modalities)
        )
        return self.critic(torch.cat([emb_obs, emb_goal], dim=-1), action)


def build_cql_torch(modalities=("rgb_static",), latent_dim=8, hidden_dim=16,
                    goal_hidden=16, policy_layers=2, q_layers=2,
                    policy_hidden=16, q_hidden=16, action_dim=7,
                    discrete_gripper=True, with_lagrange=True,
                    plan_space=False):
    """A torch module with the reference CQL_Offline/TACORL state_dict
    layout: actor.*, q1.*, q2.*, target_q1.*, target_q2.*, log_alpha,
    log_alpha_prime (cql_offline_lightning.py:99-228 upstream).
    ``plan_space=True`` gives the TACORL-style continuous-only actor."""
    modalities = list(modalities)
    state_dim = latent_dim * len(modalities)
    goal_dim = latent_dim * len(modalities)
    emb_dim = state_dim + goal_dim

    def make_actor():
        return TVisualActorWrapper(
            TLateFusion(modalities, latent_dim, hidden_dim),
            TGoalEncoder(goal_dim, goal_dim, goal_hidden),
            TActor(TMLPPolicy(emb_dim, action_dim, policy_layers,
                              policy_hidden,
                              discrete_gripper and not plan_space)),
            modalities, modalities,
        )

    def make_critic():
        return TVisualCriticWrapper(
            TLateFusion(modalities, latent_dim, hidden_dim),
            TGoalEncoder(goal_dim, goal_dim, goal_hidden),
            TCritic(TMLPQNetwork(emb_dim + action_dim, q_layers, q_hidden)),
            modalities, modalities,
        )

    class TCQL(nn.Module):
        def __init__(self):
            super().__init__()
            self.actor = make_actor()
            self.q1 = make_critic()
            self.q2 = make_critic()
            self.target_q1 = make_critic()
            self.target_q2 = make_critic()
            self.log_alpha = nn.Parameter(torch.zeros(1))
            if with_lagrange:
                self.log_alpha_prime = nn.Parameter(torch.zeros(1))

    m = TCQL()
    m.target_q1.load_state_dict(m.q1.state_dict())
    m.target_q2.load_state_dict(m.q2.state_dict())
    return m


class TRIL(nn.Module):
    """Reference RelayImitationLearning layout: perceptual_encoder.*,
    goal_encoder.*, high_level_policy.*, low_level_policy.*
    (relay_imitation_learning.py:55-91 upstream)."""

    def __init__(self, modalities=("rgb_static",), latent_dim=8,
                 hidden_dim=16, goal_hidden=16, goal_out=8,
                 hl_layers=2, ll_layers=2, policy_hidden=16, action_dim=7):
        super().__init__()
        modalities = list(modalities)
        state_dim = latent_dim * len(modalities)
        self.perceptual_encoder = TLateFusion(modalities, latent_dim, hidden_dim)
        self.goal_encoder = TGoalEncoder(state_dim, goal_out, goal_hidden)
        self.high_level_policy = TActor(
            TMLPPolicy(state_dim + goal_out, goal_out, hl_layers,
                       policy_hidden, False)
        )
        self.low_level_policy = TActor(
            TMLPPolicy(state_dim + goal_out, action_dim, ll_layers,
                       policy_hidden, False)
        )


class TPlanRecognitionTransformer(nn.Module):
    """Reference layout: position_embeddings.*, transformer_encoder.layers.{i}.*,
    fc.*, mean_fc.*, variance_fc.* (plan_recognition_transformer.py:10-105
    upstream); learned position embeddings, post-LN encoder, mean-pool."""

    def __init__(self, state_dim, latent_plan_dim, num_heads=4, num_layers=1,
                 encoder_hidden_size=16, fc_hidden_size=16,
                 max_position_embeddings=16, min_std=1e-4):
        super().__init__()
        assert state_dim % num_heads == 0, "use a head-divisible test dim"
        self.min_std = min_std
        self.position_embeddings = nn.Embedding(max_position_embeddings,
                                                state_dim)
        layer = nn.TransformerEncoderLayer(
            state_dim, num_heads, dim_feedforward=encoder_hidden_size,
            dropout=0.0,
        )
        self.transformer_encoder = nn.TransformerEncoder(layer, num_layers)
        self.fc = nn.Linear(state_dim, fc_hidden_size)
        self.mean_fc = nn.Linear(fc_hidden_size, latent_plan_dim)
        self.variance_fc = nn.Linear(fc_hidden_size, latent_plan_dim)

    def forward(self, emb):  # (B, T, D)
        b, t, _ = emb.shape
        pos = self.position_embeddings(torch.arange(t).unsqueeze(0))
        x = (emb + pos).permute(1, 0, 2)  # (T, B, D)
        x = self.transformer_encoder(x)
        x = self.fc(x.permute(1, 0, 2)).mean(dim=1)
        mean = self.mean_fc(x)
        std = F.softplus(self.variance_fc(x)) + self.min_std
        return mean, std


class TActionDecoderLogistic(nn.Module):
    """Reference layout: rnn.*, mean_fc.*, log_scale_fc.*, prob_fc.*,
    gripper_fc.* (action_decoder_logistic.py:21-300 upstream)."""

    LOG_SIG_MIN = -5

    def __init__(self, in_features, hidden_size=16, num_layers=1,
                 out_features=7, n_mixtures=4, discrete_gripper=True):
        super().__init__()
        self.n_dist = n_mixtures
        self.discrete_gripper = discrete_gripper
        self.out_features = out_features - 1 if discrete_gripper else out_features
        self.rnn = nn.RNN(in_features, hidden_size, num_layers,
                          nonlinearity="relu", batch_first=True)
        self.mean_fc = nn.Linear(hidden_size, self.out_features * n_mixtures)
        self.log_scale_fc = nn.Linear(hidden_size, self.out_features * n_mixtures)
        self.prob_fc = nn.Linear(hidden_size, self.out_features * n_mixtures)
        if discrete_gripper:
            self.gripper_fc = nn.Linear(hidden_size, 2)

    def forward(self, latent_plan, perceptual_emb):
        b, s = perceptual_emb.shape[:2]
        plan = latent_plan.unsqueeze(1).expand(-1, s, -1)
        x = torch.cat([plan, perceptual_emb], dim=-1)
        x, _ = self.rnn(x)
        shape = (b, s, self.out_features, self.n_dist)
        logit_probs = self.prob_fc(x).view(shape)
        means = self.mean_fc(x).view(shape)
        log_scales = torch.clamp(self.log_scale_fc(x),
                                 min=self.LOG_SIG_MIN).view(shape)
        gripper = self.gripper_fc(x) if self.discrete_gripper else None
        return logit_probs, log_scales, means, gripper


class TPlayLMP(nn.Module):
    """Reference PlayLMP layout: perceptual_encoder.networks.<mod>.*,
    goal_encoder.*, plan_recognition.*, plan_proposal.policy.*,
    action_decoder.* (play_lmp_for_rl.py:80-130 upstream)."""

    def __init__(self, modalities=("rgb_static",), latent_dim=8,
                 hidden_dim=16, goal_hidden=16, latent_plan_dim=8,
                 pr_heads=4, pr_layers=1, pp_layers=2, policy_hidden=16,
                 ad_hidden=16, ad_layers=1, n_mixtures=4, action_dim=7):
        super().__init__()
        modalities = list(modalities)
        state_dim = latent_dim * len(modalities)
        self.perceptual_encoder = TLateFusion(modalities, latent_dim, hidden_dim)
        self.goal_encoder = TGoalEncoder(state_dim, state_dim, goal_hidden)
        self.plan_recognition = TPlanRecognitionTransformer(
            state_dim, latent_plan_dim, pr_heads, pr_layers,
        )
        self.plan_proposal = TActor(
            TMLPPolicy(state_dim * 2, latent_plan_dim, pp_layers,
                       policy_hidden, False)
        )
        self.action_decoder = TActionDecoderLogistic(
            state_dim + latent_plan_dim, ad_hidden, ad_layers, action_dim,
            n_mixtures, True,
        )
