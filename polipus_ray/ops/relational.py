"""Relational operators over the TPC-H-shaped test tables.

The reference engine is a crawler, not a SQL engine — these ops are
part of the training-data/query extension surface: a large-scale
pipeline constantly joins fact tables against dimension tables
(metadata enrichment) and computes grouped rollups, and the three ops
here pin the three physical join/aggregate plans that matter at
100 TB:

- ``pricing_summary`` (TPC-H Q1 shape): map-side partial aggregation
  inside ``map_batches`` — each batch folds to at most
  |returnflag| x |linestatus| rows — then one tiny ``groupby`` merge.
  The shuffle carries O(groups) rows per block, never the fact rows.

- ``order_revenue_topn`` (TPC-H Q3 shape): a LARGE-LARGE distributed
  hash join (revenue-per-order x orders) via the native
  ``Dataset.join``, with the small dimension (customer -> mktsegment)
  BROADCAST once via ``ray.put`` and probed inside ``map_batches`` —
  the broadcast-vs-shuffle split the 100 TB brief mandates.  The
  final top-n is a map-side partial top-n + single tiny merge, never
  a global sort.

- ``region_sales`` (star-schema rollup): the full dimension chain
  customer -> nation -> region folded into ONE broadcast lookup table
  (dims are small by definition), probed per batch; the fact table
  (orders) streams through map-only until the bounded final groupby.

Money travels as integer CENTS (``round(x*100)``) so every sum is
order-independent and bit-exact against the DuckDB oracles (the
source doubles are 2-decimal values; scaling at read time is the
same trick the window aggregates use).  Derived products stay in
int64: revenue = cents x (100 - discount_pct) is exact, as is charge
= cents x (100-d) x (100+t).  (At true 100 TB row counts the charge
sum would need int128 — DuckDB's HUGEINT — noted per-op.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns: list[str], filter_expr=None):
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    path = f"{sf_dir}/{table}.parquet"
    kw = {"columns": columns, "override_num_blocks": small_read_blocks(path)}
    if filter_expr is not None:
        # row-group predicate pushdown: only matching row groups are
        # decoded at the read, the 100 TB "prune at the read" rule
        kw["filter"] = filter_expr
    return ray.data.read_parquet(path, **kw)


def _cents(col) -> np.ndarray:
    """double dollars -> int64 cents.  Source values are 2-decimal, so
    x*100 lands within 1e-9 of an integer and round() is engine-
    independent (never at a .5 boundary)."""
    return np.round(col.to_numpy() * 100.0).astype(np.int64)


_TS_US = 1_000_000


def _us(date: str) -> int:
    """'YYYY-MM-DD' -> epoch microseconds (UTC midnight)."""
    import datetime

    d = datetime.datetime.fromisoformat(date).replace(tzinfo=datetime.timezone.utc)
    return int(d.timestamp()) * _TS_US


def pricing_summary(sf_dir: str, cutoff: str = "1998-12-01"):
    """TPC-H Q1 shape: grouped pricing rollup over lineitem rows
    shipped on/before ``cutoff``.

    Output: l_returnflag, l_linestatus, sum_qty, sum_base_c (cents),
    sum_disc_cc (cents x (100-disc)), sum_charge_cccc
    (cents x (100-disc) x (100+tax)), n_rows — all int64.
    """
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"]
    ds = _read(sf_dir, "lineitem", cols, filter_expr=(pc.field("l_shipdate") <= pa.scalar(_us(cutoff), pa.timestamp("us"))))

    def partial(batch: pa.Table) -> pa.Table:
        # (defense in depth: the read filter already pruned row groups)
        ts = batch["l_shipdate"].cast(pa.int64()).to_numpy()
        keep = ts <= _us(cutoff)
        if not keep.all():
            batch = batch.filter(pa.array(keep))
        rf = pc.dictionary_encode(batch["l_returnflag"].combine_chunks())
        ls = pc.dictionary_encode(batch["l_linestatus"].combine_chunks())
        rf_c = rf.indices.to_numpy().astype(np.int64)
        ls_c = ls.indices.to_numpy().astype(np.int64)
        key = rf_c * len(ls.dictionary) + ls_c
        qty = np.round(batch["l_quantity"].to_numpy()).astype(np.int64)
        base = _cents(batch["l_extendedprice"])
        disc = 100 - _cents(batch["l_discount"])  # cents of (1-d): 90..100
        tax = 100 + _cents(batch["l_tax"])
        disc_cc = base * disc
        charge = disc_cc * tax
        order = np.argsort(key, kind="stable")
        k_s = key[order]
        new = np.ones(len(k_s), bool)
        new[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(new)
        g = k_s[starts]
        return pa.table(
            {
                "l_returnflag": rf.dictionary.take(pa.array(g // len(ls.dictionary))),
                "l_linestatus": ls.dictionary.take(pa.array(g % len(ls.dictionary))),
                "sum_qty": pa.array(np.add.reduceat(qty[order], starts), pa.int64()),
                "sum_base_c": pa.array(np.add.reduceat(base[order], starts), pa.int64()),
                "sum_disc_cc": pa.array(np.add.reduceat(disc_cc[order], starts), pa.int64()),
                "sum_charge_cccc": pa.array(np.add.reduceat(charge[order], starts), pa.int64()),
                "n_rows": pa.array(np.add.reduceat(np.ones(len(k_s), np.int64), starts), pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        sums = {c: pa.array([int(group[c].to_numpy().sum())], pa.int64()) for c in ("sum_qty", "sum_base_c", "sum_disc_cc", "sum_charge_cccc", "n_rows")}
        return pa.table({"l_returnflag": group["l_returnflag"][:1], "l_linestatus": group["l_linestatus"][:1], **sums})

    # the merge groupby is bounded by the key DOMAIN (|flags| x
    # |statuses| ~ 6), not the row count — safe as a direct groupby
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(merge, batch_format="pyarrow")
        .sort(["l_returnflag", "l_linestatus"])
    )


def _revenue_per_order(sf_dir: str, shipped_after: str):
    """lineitem -> (l_orderkey, revenue_cc) partial-aggregated map-side
    then folded per orderkey through a BOUNDED bucket shuffle (not one
    Ray group per orderkey — orderkeys are unbounded at scale)."""
    from polipus_ray.ops.windows import _bucket_tag

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter_expr=(pc.field("l_shipdate") > pa.scalar(_us(shipped_after), pa.timestamp("us"))),
    )

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()).to_numpy()
        keep = ts > _us(shipped_after)
        if not keep.all():
            batch = batch.filter(pa.array(keep))
        ok = batch["l_orderkey"].to_numpy()
        rev = _cents(batch["l_extendedprice"]) * (100 - _cents(batch["l_discount"]))
        order = np.argsort(ok, kind="stable")
        ok_s = ok[order]
        new = np.ones(len(ok_s), bool)
        new[1:] = ok_s[1:] != ok_s[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "l_orderkey": pa.array(ok_s[starts], pa.int64()),
                "revenue_cc": pa.array(np.add.reduceat(rev[order], starts), pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        ok = group["l_orderkey"].to_numpy()
        rev = group["revenue_cc"].to_numpy()
        order = np.argsort(ok, kind="stable")
        ok_s = ok[order]
        new = np.ones(len(ok_s), bool)
        new[1:] = ok_s[1:] != ok_s[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "l_orderkey": pa.array(ok_s[starts], pa.int64()),
                "revenue_cc": pa.array(np.add.reduceat(rev[order], starts), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    from polipus_ray.ops.dedup import join_partitions

    # fold's output schema already omits the pk tag
    return _bucket_tag(parts, "l_orderkey", join_partitions(None)).map_groups(fold, batch_format="pyarrow")


def order_revenue_topn(sf_dir: str, n: int = 20, segment: str = "BUILDING", date: str = "1998-06-30", broadcast_limit: int = 2_000_000):
    """TPC-H Q3 shape: top-``n`` open orders by post-``date`` revenue
    for customers in ``segment``.

    Plan: revenue-per-order (bounded-bucket fold) NATIVE-hash-joined
    against orders(o_orderdate < date); customer -> segment probed
    from a ``ray.put`` broadcast (dimension side); partial top-n per
    batch + one merge.  Output: o_orderkey, o_orderdate_us,
    o_orderpriority, revenue_cc.
    """
    import ray
    import ray.data

    from polipus_ray.ops.dedup import join_partitions

    rev = _revenue_per_order(sf_dir, shipped_after=date)
    orders = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter_expr=(pc.field("o_orderdate") < pa.scalar(_us(date), pa.timestamp("us"))),
    )

    def orders_prep(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy()
        keep = ts < _us(date)
        if not keep.all():
            batch = batch.filter(pa.array(keep))
            ts = ts[keep]
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "o_orderdate_us": pa.array(ts, pa.int64()),
                "o_orderpriority": batch["o_orderpriority"],
            }
        )

    orders = orders.map_batches(orders_prep, batch_format="pyarrow")
    # dimension broadcast: custkey -> in-segment?  customer is a
    # dimension table (bounded), shipped to the object store ONCE and
    # probed zero-copy per batch — never re-shipped per task argument
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg_keys = cust.filter(pc.equal(cust["c_mktsegment"], segment))["c_custkey"].to_numpy()
    seg_ref = ray.put(np.sort(seg_keys))

    def seg_filter(batch: pa.Table) -> pa.Table:
        from polipus_ray.ops.dedup import sorted_member

        keys = ray.get(seg_ref)
        hit, _ = sorted_member(keys, batch["o_custkey"].to_numpy())
        return batch.filter(pa.array(hit)).drop_columns(["o_custkey"])

    orders = orders.map_batches(seg_filter, batch_format="pyarrow")
    # large-large distributed hash join: revenue x orders on orderkey.
    # Size the partition count from the bigger input's ROW COUNT
    # (parquet metadata — free), not the CPU count: each partition
    # spins an aggregator actor, and 32 partitions for a sub-100k-row
    # join is pure spin-up (measured 2.5 s -> sub-second at sf0.1)
    # adaptive dual path (the _jaccard_verify_join pattern): the probe
    # side after the segment+date filters is usually FAR below
    # broadcast scale — count it (narrow materialized dataset) and
    # broadcast-join below the gate (one ray.put + searchsorted per
    # batch, no aggregator actors), native hash join above.  Both
    # paths pinned equal by test_order_revenue_join_paths_equal
    # (broadcast_limit=0 with a STRICT gate forces native even for an
    # empty probe side).
    orders = orders.materialize()
    n_open = orders.count()
    if n_open < broadcast_limit:
        parts_t = [b for b in orders.iter_batches(batch_size=1 << 20, batch_format="pyarrow")]
        ot = pa.concat_tables(parts_t) if parts_t else None
        if ot is None or ot.num_rows == 0:
            bref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64), pa.array([], pa.string())))
        else:
            ks = ot["o_orderkey"].to_numpy()
            o_ord = np.argsort(ks)
            bref = ray.put(
                (
                    ks[o_ord],
                    ot["o_orderdate_us"].to_numpy()[o_ord],
                    ot["o_orderpriority"].combine_chunks().take(pa.array(o_ord)),
                )
            )

        def bjoin(batch: pa.Table) -> pa.Table:
            from polipus_ray.ops.dedup import sorted_member

            ks_, ds_, ps_ = ray.get(bref)
            lk = batch["l_orderkey"].to_numpy()
            hit, pos = sorted_member(ks_, lk)
            b = batch.filter(pa.array(hit))
            p2 = pos[hit]
            return pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "revenue_cc": b["revenue_cc"],
                    "o_orderdate_us": pa.array(ds_[p2], pa.int64()),
                    "o_orderpriority": ps_.take(pa.array(p2)),
                }
            )

        joined = rev.map_batches(bjoin, batch_format="pyarrow")
    else:
        n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
        joined = rev.join(
            orders,
            join_type="inner",
            num_partitions=join_partitions(n_orders),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

    def topn(batch: pa.Table) -> pa.Table:
        rev_v = batch["revenue_cc"].to_numpy()
        ok = batch["l_orderkey"].to_numpy()
        order = np.lexsort((ok, -rev_v))[:n]
        t = batch.take(pa.array(order))
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "o_orderdate_us": t["o_orderdate_us"],
                "o_orderpriority": t["o_orderpriority"],
                "revenue_cc": t["revenue_cc"],
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        rev_v = group["revenue_cc"].to_numpy()
        ok = group["o_orderkey"].to_numpy()
        order = np.lexsort((ok, -rev_v))[:n]
        return group.take(pa.array(order)).drop_columns(["pk"])

    parts = joined.map_batches(topn, batch_format="pyarrow")

    def const_tag(batch: pa.Table) -> pa.Table:
        return batch.append_column("pk", pa.array(np.zeros(len(batch), np.int32), pa.int32()))

    # single-group merge over <= n rows per upstream block — tiny
    out = parts.map_batches(const_tag, batch_format="pyarrow").groupby("pk").map_groups(merge, batch_format="pyarrow")
    return out.sort(["revenue_cc", "o_orderkey"], descending=[True, False])


def region_sales(sf_dir: str):
    """Star-schema rollup: order count + total price (cents) per
    (region, nation) of the ordering customer.

    The whole dimension chain (customer -> nation -> region) folds
    into ONE broadcast int array indexed by custkey (dims are small by
    definition; at 100 TB the fact table is the big side and still
    streams map-only until the bounded final groupby).  Output:
    r_name, n_name, n_orders, total_c.
    """
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    r_names = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    n_key = nat["n_nationkey"].to_pylist()
    labels = {nk: (r_names[rk], nm) for nk, nm, rk in zip(n_key, nat["n_name"].to_pylist(), nat["n_regionkey"].to_pylist())}
    # label id per nation, custkey -> label id lookup arrays
    label_list = sorted(set(labels.values()))
    label_id = {v: i for i, v in enumerate(label_list)}
    ck = cust["c_custkey"].to_numpy()
    nk = cust["c_nationkey"].to_numpy()
    lut = np.full(int(ck.max()) + 1, -1, np.int32)
    lut[ck] = np.array([label_id[labels[int(k)]] for k in nk], np.int32)
    lut_ref = ray.put(lut)

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        lv = ray.get(lut_ref)
        ck_b = batch["o_custkey"].to_numpy()
        lab = lv[ck_b]
        cents = _cents(batch["o_totalprice"])
        n_lab = len(label_list)
        cnt = np.bincount(lab, minlength=n_lab)
        # integer-exact grouped sum (float bincount would cap at 2^53)
        tot_i = np.zeros(n_lab, np.int64)
        order = np.argsort(lab, kind="stable")
        l_s = lab[order]
        new = np.ones(len(l_s), bool)
        new[1:] = l_s[1:] != l_s[:-1]
        starts = np.flatnonzero(new)
        tot_i[l_s[starts]] = np.add.reduceat(cents[order], starts)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "lab": pa.array(nz.astype(np.int64), pa.int64()),
                "n_orders": pa.array(cnt[nz].astype(np.int64), pa.int64()),
                "total_c": pa.array(tot_i[nz], pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        lab = int(group["lab"][0].as_py())
        r, nname = label_list[lab]
        return pa.table(
            {
                "r_name": pa.array([r], pa.string()),
                "n_name": pa.array([nname], pa.string()),
                "n_orders": pa.array([int(group["n_orders"].to_numpy().sum())], pa.int64()),
                "total_c": pa.array([int(group["total_c"].to_numpy().sum())], pa.int64()),
            }
        )

    # bounded by the nation-dimension domain (25) — safe direct groupby
    return ds.map_batches(partial, batch_format="pyarrow").groupby("lab").map_groups(merge, batch_format="pyarrow").sort(["r_name", "n_name"])


def unshipped_orders(sf_dir: str, date: str = "1998-06-30", broadcast_limit: int = 8_000_000):
    """ANTI-join plan: orders with NO lineitem shipped after ``date``.

    The build side (distinct post-``date`` orderkeys) is reduced
    map-side to per-batch distinct keys, folded in bounded hash
    buckets; below ``broadcast_limit`` keys (8 B each — the gate is
    64 MB of int64s) the sorted key array broadcasts via ``ray.put``
    and the anti-probe is one ``searchsorted`` per orders batch (no
    join actors at all); above it, NATIVE left_outer join + null-marker
    filter — the same anti-join shape the crawl's storage-dedup uses
    (J2).  Paths pinned equal by test_unshipped_join_paths_equal.
    Output: o_orderkey, o_orderdate_us, o_totalprice_c.
    """
    import ray.data

    from polipus_ray.ops.dedup import join_partitions
    from polipus_ray.ops.windows import _bucket_tag

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_shipdate"],
        filter_expr=(pc.field("l_shipdate") > pa.scalar(_us(date), pa.timestamp("us"))),
    )

    def distinct_keys(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()).to_numpy()
        ok = batch["l_orderkey"].to_numpy()[ts > _us(date)]
        return pa.table({"l_orderkey": pa.array(np.unique(ok), pa.int64()), "marker": pa.array(np.ones(len(np.unique(ok)), bool), pa.bool_())})

    def fold(group: pa.Table) -> pa.Table:
        u = np.unique(group["l_orderkey"].to_numpy())
        return pa.table({"l_orderkey": pa.array(u, pa.int64()), "marker": pa.array(np.ones(len(u), bool), pa.bool_())})

    shipped = _bucket_tag(li.map_batches(distinct_keys, batch_format="pyarrow"), "l_orderkey", join_partitions(None)).map_groups(
        fold, batch_format="pyarrow"
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate_us": pa.array(batch["o_orderdate"].cast(pa.int64()).to_numpy(), pa.int64()),
                "o_totalprice_c": pa.array(_cents(batch["o_totalprice"]), pa.int64()),
            }
        )

    import pyarrow.parquet as pq

    shipped = shipped.materialize()
    n_keys = shipped.count()
    if n_keys < broadcast_limit:
        import ray

        parts_t = [b["l_orderkey"].to_numpy() for b in shipped.iter_batches(batch_size=1 << 20, batch_format="pyarrow")]
        keys = np.sort(np.concatenate(parts_t)) if parts_t else np.empty(0, np.int64)
        kref = ray.put(keys)

        def anti_bcast(batch: pa.Table) -> pa.Table:
            from polipus_ray.ops.dedup import sorted_member

            ks = ray.get(kref)
            b = prep(batch)
            hit, _ = sorted_member(ks, b["o_orderkey"].to_numpy())
            return b.filter(pa.array(~hit))

        return orders.map_batches(anti_bcast, batch_format="pyarrow").sort("o_orderkey")

    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    j = orders.map_batches(prep, batch_format="pyarrow").join(
        shipped,
        join_type="left_outer",
        num_partitions=join_partitions(n_orders),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def anti(batch: pa.Table) -> pa.Table:
        keep = pc.is_null(batch["marker"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate_us": batch["o_orderdate_us"],
                "o_totalprice_c": batch["o_totalprice_c"],
            }
        ).filter(pa.array(keep))

    return j.map_batches(anti, batch_format="pyarrow").sort("o_orderkey")
