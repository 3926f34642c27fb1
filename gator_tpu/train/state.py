"""Train state: params + batch stats + optimizer state as one pytree."""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any           # {} when the model has no BatchNorm
    opt_state: Any

    @classmethod
    def create(cls, variables: Dict[str, Any],
               tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    def model_variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def apply_gradients(self, tx: optax.GradientTransformation, grads,
                        new_batch_stats: Optional[Any] = None
                        ) -> "TrainState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
        )
