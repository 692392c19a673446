"""Golden regression: a deterministic build must keep producing the same
store across refactors (protects rounds of optimization from silent
semantic drift; the oracle tests prove semantics, this pins them).

If a change INTENTIONALLY alters ingest semantics, update the constants
here together with the oracle tests.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.memory import ingest as ing
from bsc_nav_tpu.memory.store import init_store

from test_ingest import make_frames


def test_golden_ingest_digest():
    cfg = small_test_config()
    rgb, depth, poses, tokens = make_frames(cfg, 2, seed=123)
    state = init_store(cfg.memory)
    state, stats = ing.ingest_frames(
        state, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
        jnp.asarray(tokens), jax.random.PRNGKey(123), cfg)

    n = int(state.num_voxels)
    pos = np.asarray(state.slot_pos)[:n]
    counts = np.asarray(state.feat_count)[:n]
    digest = {
        "num_voxels": n,
        "pos_sum": int(pos.astype(np.int64).sum()),
        "count_sum": int(counts.sum()),
        "weight_sum": round(float(np.asarray(state.weight)[:n].sum()), 3),
        "max_height_occupied": int((np.asarray(state.max_height) >= 0).sum()),
    }
    # --- pinned values (update deliberately, with a commit message
    # explaining the semantic change) ---
    PINNED = {"num_voxels": 732, "pos_sum": 59852, "count_sum": 806,
              "weight_sum": 154.392, "max_height_occupied": 574}
    if digest != PINNED:
        raise AssertionError(
            f"golden digest changed:\n  got     {digest}\n"
            f"  pinned  {PINNED}\n"
            "If this change is intentional, update PINNED with the commit.")
