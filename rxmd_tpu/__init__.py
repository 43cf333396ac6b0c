"""rxmd-tpu: TPU-native reactive molecular dynamics (ReaxFF/QEq/PQEq)."""
import jax as _jax

# MD coordinate transforms (frac <-> real) and the dense QEq matvec are
# jnp matmuls; the TPU default bf16 matmul precision would round positions
# to ~0.01 A and break CG convergence.  All heavy compute here is
# elementwise/gather (unaffected), so forcing full precision costs nothing.
_jax.config.update("jax_default_matmul_precision", "highest")
