"""nisaba-parity operator surface (SURVEY.md §2.1).

Call sites in the reference drivers (38 total) use exactly:
  gradient_scalar(tape, u, x)
  divergence_vector(tape, u_vect, x, dim)
  laplacian_scalar(tape, u, x, dim)
"""

from tpinn.operators import (
    gradient_scalar,
    divergence_vector,
    laplacian_scalar,
    laplacian_vector,
)

__all__ = [
    "gradient_scalar",
    "divergence_vector",
    "laplacian_scalar",
    "laplacian_vector",
]
