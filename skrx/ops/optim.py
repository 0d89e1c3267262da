"""Row-wise lazy Adam for embedding tables.

No reference counterpart (skrec uses dense torch.optim.Adam, which reads and
writes every embedding row on every minibatch). At production catalog sizes
the dense moment update dominates the step; this optimizer touches only the
rows present in the batch — O(B*D) HBM traffic per step instead of O(N*D) —
with torch.optim.SparseAdam semantics: per-row step counts for bias
correction, moments of untouched rows frozen. Duplicated rows within a batch
are deduplicated on device (sort + segment-sum) so their gradients sum
exactly as dense Adam would.

Opt-in (models default to dense Adam for reference parity). Measured on a
TPU v5e (B=1024, D=64): the row-wise update costs ~0.65 ms/step regardless
of N (sort + segment-sum + scatters), while the dense update scales with the
table; break-even is around N ~ 200k rows at D=64 — use lazy_adam for
larger-than-that catalogs, dense Adam below. Full-model scale check (FPMC,
4 tables, 1M items, B=1024, under the whole-epoch lax.scan): 3.5 ms/step
lazy vs ~30 ms dense flat Adam (~8x). NOTE: the in-place row scatters rely
on lax.scan's carry aliasing — a bare jitted step without donated carries
copies each table and loses the win; all skrx pipelines run steps under
scan.
"""
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["LazyAdamState", "lazy_adam_init", "lazy_adam_row_update",
           "dedup_rows", "make_lazy_train_step"]


class LazyAdamState(NamedTuple):
    m: jnp.ndarray       # (N, D) first moment
    v: jnp.ndarray       # (N, D) second moment
    counts: jnp.ndarray  # (N,) per-row step counts (bias correction)


def lazy_adam_init(table: jnp.ndarray) -> LazyAdamState:
    return LazyAdamState(jnp.zeros_like(table), jnp.zeros_like(table),
                         jnp.zeros(table.shape[0], jnp.int32))


def dedup_rows(rows: jnp.ndarray, grads: jnp.ndarray,
               drop_id: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum gradients of duplicate row ids.

    rows: (K,) int32 (may contain drop_id entries to ignore);
    grads: (K, D) or (K,).
    Returns (unique_rows (K,), summed_grads) where slots beyond the unique
    count carry drop_id (scatters with mode='drop' skip them).
    """
    k = rows.shape[0]
    order = jnp.argsort(rows)
    rows_s = rows[order]
    grads_s = grads[order]
    is_first = jnp.concatenate([jnp.ones(1, bool), rows_s[1:] != rows_s[:-1]])
    seg_id = jnp.cumsum(is_first) - 1                       # (K,) in [0, K)
    summed = jax.ops.segment_sum(grads_s, seg_id, num_segments=k)
    unique = jax.ops.segment_min(rows_s, seg_id, num_segments=k)
    # empty segments: segment_min yields the dtype max — map to drop_id
    n_unique = seg_id[-1] + 1
    slot = jnp.arange(k)
    unique = jnp.where(slot < n_unique, unique, drop_id)
    return unique, summed


def lazy_adam_row_update(state: LazyAdamState, table: jnp.ndarray,
                         rows: jnp.ndarray, grads: jnp.ndarray,
                         lr: float, b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8, weight_decay: float = 0.0
                         ) -> Tuple[LazyAdamState, jnp.ndarray]:
    """Apply one Adam step to the given rows only.

    rows: (K,) int32, entries may repeat or equal table.shape[0] (dropped).
    grads: (K, D) matching table's trailing dims (or (K,) for 1-D tables).
    ``weight_decay`` adds wd * row to the summed gradient of each TOUCHED
    row (adam_l2 / add_decayed_weights semantics restricted to touched rows
    — the SparseAdam-style deviation: untouched rows do not decay).
    """
    drop = table.shape[0]
    rows_u, g = dedup_rows(rows, grads, drop)
    if weight_decay:
        safe0 = jnp.minimum(rows_u, drop - 1)
        dec = weight_decay * table[safe0]
        ok = (rows_u < drop)
        g = g + jnp.where(ok[:, None] if g.ndim == 2 else ok, dec,
                          jnp.zeros_like(dec))
    safe = jnp.minimum(rows_u, drop - 1)
    valid = (rows_u < drop)[:, None] if g.ndim == 2 else (rows_u < drop)

    m_rows = state.m[safe]
    v_rows = state.v[safe]
    t = state.counts[safe] + 1

    m_new = b1 * m_rows + (1 - b1) * g
    v_new = b2 * v_rows + (1 - b2) * jnp.square(g)
    t_f = t.astype(table.dtype)
    if g.ndim == 2:
        m_hat = m_new / (1 - b1 ** t_f)[:, None]
        v_hat = v_new / (1 - b2 ** t_f)[:, None]
    else:
        m_hat = m_new / (1 - b1 ** t_f)
        v_hat = v_new / (1 - b2 ** t_f)
    delta = -lr * m_hat / (jnp.sqrt(v_hat) + eps)

    table = table.at[rows_u].add(jnp.where(valid, delta, 0), mode="drop")
    m = state.m.at[rows_u].set(jnp.where(valid, m_new, m_rows), mode="drop")
    v = state.v.at[rows_u].set(jnp.where(valid, v_new, v_rows), mode="drop")
    counts = state.counts.at[rows_u].set(
        jnp.where(rows_u < drop, t, state.counts[safe]), mode="drop")
    return LazyAdamState(m, v, counts), table


def make_lazy_train_step(lr: float, gathers, loss_fn, params,
                         weight_decay: float = 0.0, with_key: bool = False):
    """Generic train step with row-wise lazy Adam on embedding tables.

    The loss must be expressed over GATHERED rows so the backward never
    materializes dense table gradients (the point of the exercise — this is
    what BPRMF's bespoke lazy path does, factored out for the rest of the
    embedding-dominant zoo).

    gathers: list of ``(table_key, rows_fn)`` where ``rows_fn(batch)`` returns
      the (K,) int32 rows gathered from ``params[table_key]``. The same table
      may appear multiple times (e.g. positives and negatives); its row sets
      are concatenated into one update so overlapping rows sum exactly as
      dense Adam would (``dedup_rows``).
    loss_fn(gathered, dense_params, batch): ``gathered`` is the list of
      gathered row blocks in ``gathers`` order; ``dense_params`` holds every
      other leaf, updated with dense optax Adam at the same lr.

    Returns ``(train_step, opt_state)`` with the usual
    ``(params, opt_state), loss = train_step((params, opt_state), batch)``
    contract (``with_key=True`` threads a PRNG key through the carry —
    ``(params, opt_state, key)`` — and passes a fresh subkey to
    ``loss_fn(gathered, dense, batch, key)``, for dropout-style steps).
    ``weight_decay`` applies adam_l2-style decay: on dense leaves exactly,
    on tables to TOUCHED rows only (SparseAdam-style deviation; untouched
    rows do not decay). Untouched-row moments are frozen, not decayed —
    see module docstring.
    """
    import optax

    from ..models.common import adam_l2

    table_keys = []
    for k, _ in gathers:
        if k not in table_keys:
            table_keys.append(k)
    dense_keys = [k for k in params if k not in table_keys]
    dense_opt = adam_l2(lr, weight_decay)
    opt_state = ({k: lazy_adam_init(params[k]) for k in table_keys},
                 dense_opt.init({k: params[k] for k in dense_keys}))

    def train_step(carry, batch):
        if with_key:
            params, (lazy_states, dense_state), key = carry
            key, sub = jax.random.split(key)
        else:
            params, (lazy_states, dense_state) = carry
        rows = [rows_fn(batch) for _, rows_fn in gathers]
        gathered = [params[k][r] for (k, _), r in zip(gathers, rows)]
        dense = {k: params[k] for k in dense_keys}
        if with_key:
            loss, (g_rows, g_dense) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(gathered, dense, batch, sub)
        else:
            loss, (g_rows, g_dense) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(gathered, dense, batch)

        new_params = dict(params)
        new_lazy = dict(lazy_states)
        by_table = {}
        for (k, _), r, g in zip(gathers, rows, g_rows):
            by_table.setdefault(k, []).append((r, g))
        for k, items in by_table.items():
            r = jnp.concatenate([a for a, _ in items])
            g = jnp.concatenate([b for _, b in items])
            new_lazy[k], new_params[k] = lazy_adam_row_update(
                new_lazy[k], params[k], r, g, lr,
                weight_decay=weight_decay)
        if dense_keys:
            updates, dense_state = dense_opt.update(g_dense, dense_state,
                                                    dense)
            for k, upd in optax.apply_updates(dense, updates).items():
                new_params[k] = upd
        if with_key:
            return (new_params, (new_lazy, dense_state), key), loss
        return (new_params, (new_lazy, dense_state)), loss

    return train_step, opt_state
