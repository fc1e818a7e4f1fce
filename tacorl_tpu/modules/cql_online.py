"""Online CQL: SAC's env-in-the-loop training + the conservative penalty
(reference: modules/cql/cql_online_lightning.py:16-310)."""

from __future__ import annotations

from tacorl_tpu.modules.sac import SACModule

__all__ = ["CQLOnlineModule"]


class CQLOnlineModule(SACModule):
    name = "cql_online"
    use_conservative = True
