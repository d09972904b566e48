"""nisaba-parity namespace: ``ns.experimental.physics.tens_style.*``."""

from tpinn.experimental import physics

__all__ = ["physics"]
