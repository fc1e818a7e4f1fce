"""Numerical parity of converted torch weights: every converter primitive is
checked against the corresponding torch.nn module's forward — the
architecture-parity evidence for loading released reference checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.networks.action_decoder import StackedRNN
from tacorl_tpu.networks.layers import TorchConv, TorchDense
from tacorl_tpu.networks.plan_recognition import _PostLNEncoderLayer
from tacorl_tpu.utils.torch_convert import (
    convert_conv2d,
    convert_linear,
    convert_rnn,
    convert_transformer_layer,
)

torch = pytest.importorskip("torch")


def test_linear_parity(rng):
    lin = torch.nn.Linear(6, 4)
    x = np.random.RandomState(0).randn(3, 6).astype(np.float32)
    expected = lin(torch.tensor(x)).detach().numpy()
    params = convert_linear(lin.state_dict(), "")
    out = TorchDense(4).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_conv2d_parity(rng):
    conv = torch.nn.Conv2d(3, 8, kernel_size=4, stride=2)
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    expected = conv(torch.tensor(x)).detach().numpy()  # NCHW
    params = convert_conv2d(conv.state_dict(), "")
    out = TorchConv(8, 4, 2, dtype=None).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), expected, atol=1e-4
    )


@pytest.mark.parametrize(
    "cell_type,torch_cls,kwargs",
    [
        ("rnn", torch.nn.RNN, {"nonlinearity": "relu"}),
        ("gru", torch.nn.GRU, {}),
        ("lstm", torch.nn.LSTM, {}),
    ],
)
def test_rnn_parity(cell_type, torch_cls, kwargs):
    t_rnn = torch_cls(
        input_size=5, hidden_size=4, num_layers=2, batch_first=True, **kwargs
    )
    x = np.random.RandomState(0).randn(2, 7, 5).astype(np.float32)
    expected, _ = t_rnn(torch.tensor(x))
    params = convert_rnn(t_rnn.state_dict(), "", num_layers=2, cell_type=cell_type)
    rnn = StackedRNN(cell_type, hidden_size=4, num_layers=2)
    out, _carry = rnn.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), expected.detach().numpy(), atol=2e-5
    )


def test_transformer_layer_parity():
    d, heads, ff = 8, 2, 16
    t_layer = torch.nn.TransformerEncoderLayer(
        d, heads, dim_feedforward=ff, dropout=0.0
    )
    t_layer.eval()
    x = np.random.RandomState(0).randn(5, 2, d).astype(np.float32)  # (S,B,D)
    with torch.no_grad():
        expected = t_layer(torch.tensor(x)).numpy()
    params = convert_transformer_layer(t_layer.state_dict(), "", heads)
    layer = _PostLNEncoderLayer(d, heads, ff, dropout=0.0)
    out = layer.apply(
        {"params": params}, jnp.asarray(x.transpose(1, 0, 2))
    )  # (B,S,D)
    np.testing.assert_allclose(
        np.asarray(out).transpose(1, 0, 2), expected, atol=1e-4
    )


def test_assemble_play_lmp_structure(rng):
    """Synthetic reference-named state_dict -> our PlayLMPNet params: the
    converted tree must drop into net.apply without shape/name errors."""
    import jax.numpy as jnp

    from tacorl_tpu.modules.play_lmp import PlayLMPModule
    from tacorl_tpu.utils.torch_convert import assemble_play_lmp
    from tests.test_play_lmp import TINY_CFG, make_batch

    module = PlayLMPModule(dict(TINY_CFG))
    batch = make_batch(rng)
    state = module.init_state(rng, batch)

    # build a torch state_dict with the reference's attribute names and OUR
    # tiny shapes (latent 16, hidden 32, pr layers 1/heads 4, decoder rnn 1x32)
    sd = {}
    latent, hidden = 16, 32
    sd.update({f"perceptual_encoder.networks.rgb_static.model.0.{k}": v
               for k, v in torch.nn.Conv2d(3, 32, 8, 4).state_dict().items()})
    sd.update({f"perceptual_encoder.networks.rgb_static.model.2.{k}": v
               for k, v in torch.nn.Conv2d(32, 64, 4, 2).state_dict().items()})
    sd.update({f"perceptual_encoder.networks.rgb_static.model.4.{k}": v
               for k, v in torch.nn.Conv2d(64, 64, 3, 1).state_dict().items()})
    sd["perceptual_encoder.networks.rgb_static.model.6.temperature"] = (
        torch.ones(1)
    )
    sd.update({f"perceptual_encoder.networks.rgb_static.fc_layers.0.{k}": v
               for k, v in torch.nn.Linear(128, hidden).state_dict().items()})
    sd.update({f"perceptual_encoder.networks.rgb_static.fc_layers.3.{k}": v
               for k, v in torch.nn.Linear(hidden, latent).state_dict().items()})
    for i, (fin, fout) in enumerate([(latent, 32), (32, 32), (32, latent)]):
        sd.update({f"goal_encoder.mlp.{i * 2}.{k}": v
                   for k, v in torch.nn.Linear(fin, fout).state_dict().items()})
    # plan recognition transformer: d_model=latent(16) pads to 16 (4 heads ok)
    t_layer = torch.nn.TransformerEncoderLayer(16, 4, dim_feedforward=32)
    sd.update({f"plan_recognition.transformer_encoder.layers.0.{k}": v
               for k, v in t_layer.state_dict().items()})
    sd.update({"plan_recognition.position_embeddings.weight": torch.zeros(8, 16)})
    sd.update({f"plan_recognition.fc.{k}": v
               for k, v in torch.nn.Linear(16, 32).state_dict().items()})
    sd.update({f"plan_recognition.mean_fc.{k}": v
               for k, v in torch.nn.Linear(32, 8).state_dict().items()})
    sd.update({f"plan_recognition.variance_fc.{k}": v
               for k, v in torch.nn.Linear(32, 8).state_dict().items()})
    for i, (fin, fout) in enumerate([(latent * 2, 32), (32, 32)]):
        sd.update({f"plan_proposal.policy.fc_layers.{i}.{k}": v
                   for k, v in torch.nn.Linear(fin, fout).state_dict().items()})
    sd.update({f"plan_proposal.policy.fc_mean.{k}": v
               for k, v in torch.nn.Linear(32, 8).state_dict().items()})
    sd.update({f"plan_proposal.policy.fc_log_std.{k}": v
               for k, v in torch.nn.Linear(32, 8).state_dict().items()})
    dec_rnn = torch.nn.RNN(latent + 8, 32, num_layers=1, nonlinearity="relu",
                           batch_first=True)
    sd.update({f"action_decoder.rnn.{k}": v
               for k, v in dec_rnn.state_dict().items()})
    for head, fout in (("mean_fc", 24), ("log_scale_fc", 24), ("prob_fc", 24),
                       ("gripper_fc", 2)):
        sd.update({f"action_decoder.{head}.{k}": v
                   for k, v in torch.nn.Linear(32, fout).state_dict().items()})

    converted = assemble_play_lmp(
        sd, pp_num_layers=2, pr_num_layers=1, pr_num_heads=4,
        ad_num_layers=1, discrete_gripper=True,
    )
    # identical tree structure to a fresh init
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(state.params)[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert conv_paths == ref_paths, conv_paths ^ ref_paths
    # and usable in a forward pass
    states = module.transforms(rng, batch["states"], train=False)
    total, metrics, _ = module.net.apply(
        {"params": jax.tree.map(jnp.asarray, converted)},
        rng, states, jnp.asarray(batch["actions"]), jnp.asarray(1e-3), False,
        method="compute_loss",
    )
    assert np.isfinite(float(total))
