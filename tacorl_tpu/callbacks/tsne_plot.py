"""t-SNE latent-plan diagnostics (reference: utils/callbacks/tsne_plot.py:
30-164): collect sampled plan-proposal latents + the tasks each validation
window completed, embed with t-SNE, log a colored scatter.

Uses sklearn TSNE + matplotlib (MulticoreTSNE/plotly in the reference). Task
labels come from a task differ (e.g. FakeTasks / CALVIN Tasks) applied to the
first/last sim state of each window — the reference computes these through
the env held inside the module (play_lmp_for_rl.py:350-360)."""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import numpy as np

from tacorl_tpu.callbacks.base import Callback

logger = logging.getLogger("tacorl_tpu")

__all__ = ["TSNEPlotCallback"]


class TSNEPlotCallback(Callback):
    def __init__(
        self,
        task_differ: Any = None,
        perplexity: float = 30.0,
        plot_percentage: float = 1.0,
        every_n_epochs: int = 1,
        out_name: str = "tsne_plan_space",
    ):
        from tacorl_tpu.config import instantiate

        if isinstance(task_differ, dict):
            task_differ = instantiate(task_differ)
        self.task_differ = task_differ
        self.perplexity = perplexity
        self.plot_percentage = plot_percentage
        self.every_n_epochs = every_n_epochs
        self.out_name = out_name

    def _labels_for(self, outputs: List[Dict]) -> List[np.ndarray]:
        """Map each window to its completed-task id (-1 = none, skip >1)."""
        task_names = sorted(self.task_differ.tasks)
        task_to_id = {t: i for i, t in enumerate(task_names)}
        plans, labels = [], []
        for out in outputs:
            if "state_info_initial" not in out:
                continue
            n = out["sampled_plan_pp"].shape[0]
            for i in range(n):
                start = {k: v[i] for k, v in out["state_info_initial"].items()}
                end = {k: v[i] for k, v in out["state_info_final"].items()}
                completed = sorted(self.task_differ.get_task_info(start, end))
                if len(completed) > 1:
                    continue
                plans.append(np.asarray(out["sampled_plan_pp"][i]))
                labels.append(task_to_id[completed[0]] if completed else -1)
        return plans, labels

    def on_validation_end(self, trainer, module, metrics, outputs, epoch):
        if (
            self.task_differ is None
            or not outputs
            or (epoch + 1) % self.every_n_epochs != 0
        ):
            return
        plans, labels = self._labels_for(outputs)
        if len(plans) < 8:
            return
        plans = np.stack(plans)
        labels = np.asarray(labels)
        if self.plot_percentage < 1.0:
            keep = np.random.RandomState(0).rand(len(plans)) < self.plot_percentage
            plans, labels = plans[keep], labels[keep]
        from sklearn.manifold import TSNE

        perplexity = min(self.perplexity, max(2, len(plans) - 1))
        x = TSNE(perplexity=perplexity, init="random").fit_transform(plans)
        image = self._figure(x, labels)
        trainer.sink.log_image(self.out_name, image, trainer.global_step)
        out_path = trainer.ckpt.dir / f"{self.out_name}_{trainer.global_step}.png"
        try:
            import matplotlib

            matplotlib.image.imsave(out_path, image)
        except Exception:  # pragma: no cover
            pass
        logger.info("t-SNE plan plot over %d windows -> %s", len(plans), out_path)

    def _figure(self, x: np.ndarray, labels: np.ndarray) -> np.ndarray:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6), dpi=100)
        scatter = ax.scatter(
            x[:, 0], x[:, 1], c=labels, cmap="tab10", s=12, alpha=0.7
        )
        ax.set_title("latent plan space (by completed task)")
        fig.colorbar(scatter, ax=ax, shrink=0.8)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        plt.close(fig)
        return buf
