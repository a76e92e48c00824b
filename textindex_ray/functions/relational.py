"""Relational pipelines over the TPC-H-ish tables — the generic
data-processing side of the engine (scan -> filter -> join -> grouped
aggregate), built in the same partial-combine / broadcast-small-side
shapes as the text operators.

Exactness contract (the driver hash-compares values): every aggregate
is an INTEGER sum of per-row floor-scaled values — floor(x*100) /
floor(x*1e6) on float64 inputs is bit-identical between numpy and
DuckDB because both run the same IEEE double multiply before the
floor, and integer sums are order-free. No float ever crosses a
partition boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def pricing_summary(
    lineitem: "ray.data.Dataset", *, cutoff: str = "1998-09-01"
) -> "ray.data.Dataset":
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus) over rows with
    l_shipdate < cutoff — (n_rows, sum_qty, sum_base_t2, sum_disc_t2,
    sum_charge_t2, sum_disc_ppm). *_t2 = sum of floor(value*100);
    disc_ppm = sum of floor(l_discount*1e6).

    Plan: per-batch Arrow filter + integer partial sums per group key
    (the combiner — a batch ships at most |flags|x|statuses| partial
    rows no matter how many rows it holds) -> one tiny groupby over
    the partials. The wide step moves O(batches x 9) rows at any
    scale.
    """
    cut = np.datetime64(cutoff, "us")

    def partial(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy()
        keep = ship < cut
        if not keep.any():
            return pa.table(
                {"l_returnflag": pa.array([], pa.string()),
                 "l_linestatus": pa.array([], pa.string()),
                 "n_rows": pa.array([], pa.int64()),
                 "sum_qty": pa.array([], pa.int64()),
                 "sum_base_t2": pa.array([], pa.int64()),
                 "sum_disc_t2": pa.array([], pa.int64()),
                 "sum_charge_t2": pa.array([], pa.int64()),
                 "sum_disc_ppm": pa.array([], pa.int64())}
            )
        b = b.filter(pa.array(keep))
        qty = b.column("l_quantity").to_numpy()
        ep = b.column("l_extendedprice").to_numpy()
        disc = b.column("l_discount").to_numpy()
        tax = b.column("l_tax").to_numpy()
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "qty": pa.array(np.floor(qty).astype(np.int64)),
                "base": pa.array(np.floor(ep * 100.0).astype(np.int64)),
                "dp": pa.array(
                    np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
                ),
                "ch": pa.array(
                    np.floor(
                        ep * (1.0 - disc) * (1.0 + tax) * 100.0
                    ).astype(np.int64)
                ),
                "dppm": pa.array(np.floor(disc * 1e6).astype(np.int64)),
            }
        ).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("one", "sum"), ("qty", "sum"), ("base", "sum"),
             ("dp", "sum"), ("ch", "sum"), ("dppm", "sum")]
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "n_rows": t.column("one_sum").cast(pa.int64()),
                "sum_qty": t.column("qty_sum").cast(pa.int64()),
                "sum_base_t2": t.column("base_sum").cast(pa.int64()),
                "sum_disc_t2": t.column("dp_sum").cast(pa.int64()),
                "sum_charge_t2": t.column("ch_sum").cast(pa.int64()),
                "sum_disc_ppm": t.column("dppm_sum").cast(pa.int64()),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        t = g.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("n_rows", "sum"), ("sum_qty", "sum"), ("sum_base_t2", "sum"),
             ("sum_disc_t2", "sum"), ("sum_charge_t2", "sum"),
             ("sum_disc_ppm", "sum")]
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "n_rows": t.column("n_rows_sum").cast(pa.int64()),
                "sum_qty": t.column("sum_qty_sum").cast(pa.int64()),
                "sum_base_t2": t.column("sum_base_t2_sum").cast(pa.int64()),
                "sum_disc_t2": t.column("sum_disc_t2_sum").cast(pa.int64()),
                "sum_charge_t2": t.column("sum_charge_t2_sum").cast(pa.int64()),
                "sum_disc_ppm": t.column("sum_disc_ppm_sum").cast(pa.int64()),
            }
        )

    def add_flag_part(b: pa.Table) -> pa.Table:
        # the key domain is ~9 (flag x status) combiner rows per batch:
        # one reduce task holds O(batches x 9) partial rows at any
        # corpus size, so a single coarse group is the right exchange
        return b.append_column(
            "part", pa.array(np.zeros(b.num_rows, np.int32), pa.int32())
        )

    return (
        lineitem.select_columns(
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_tax", "l_shipdate"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(add_flag_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: final(g.drop_columns(["part"])),
                    batch_format="pyarrow")
    )


def top_order_revenue(
    orders: "ray.data.Dataset",
    lineitem: "ray.data.Dataset",
    customer: "ray.data.Dataset",
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    n: int = 10,
    num_partitions: int = 8,
) -> pa.Table:
    """TPC-H Q3 shape: top-n orders by revenue for one customer
    segment — revenue = sum(floor(l_extendedprice*(1-l_discount)*100))
    over the order's lineitems, orders placed before ``cutoff``.
    Output (o_orderkey, revenue_t2, o_orderdate_days), ordered
    (revenue desc, orderkey asc), n rows.

    Join plan: the segment's custkeys are a BROADCAST set (one
    ray.put; a customer table is the small side of this query at any
    scale — filter, don't shuffle); orders filter locally; the
    orders<->lineitem join is a real partitioned Dataset.join on
    orderkey (both sides large); the grouped revenue sum uses the
    per-batch integer combiner before its coarse exchange.
    """
    cut = np.datetime64(cutoff, "us")

    seg_keys = set()
    for b in customer.select_columns(["c_custkey", "c_mktsegment"]).iter_batches(
        batch_format="pyarrow"
    ):
        m = pc.equal(b.column("c_mktsegment"), segment)
        seg_keys.update(b.filter(m).column("c_custkey").to_pylist())
    seg_ref = ray.put(np.array(sorted(seg_keys), dtype=np.int64))

    def filter_orders(b: pa.Table) -> pa.Table:
        keys = ray.get(seg_ref)
        ck = b.column("o_custkey").to_numpy()
        od = b.column("o_orderdate").to_numpy()
        pos = np.searchsorted(keys, ck)
        pos = np.minimum(pos, max(keys.size - 1, 0))
        inseg = (keys[pos] == ck) if keys.size else np.zeros(ck.size, bool)
        keep = inseg & (od < cut)
        b = b.filter(pa.array(keep))
        return pa.table(
            {"o_orderkey": b.column("o_orderkey").cast(pa.int64()),
             "o_orderdate_days": pa.array(
                 b.column("o_orderdate").to_numpy().astype("datetime64[D]")
                 .astype(np.int64), pa.int64())}
        )

    def li_partial(b: pa.Table) -> pa.Table:
        ep = b.column("l_extendedprice").to_numpy()
        disc = b.column("l_discount").to_numpy()
        t = pa.table(
            {"l_orderkey": b.column("l_orderkey").cast(pa.int64()),
             "rev": pa.array(
                 np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
             )}
        ).group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"),
             "rev": t.column("rev_sum").cast(pa.int64())}
        )

    filt = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(filter_orders, batch_format="pyarrow").materialize()
    if filt.count() == 0:
        return pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "revenue_t2": pa.array([], pa.int64()),
             "o_orderdate_days": pa.array([], pa.int64())}
        )
    li = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow")

    from textindex_ray.functions._util import join_right

    joined = li.join(
        join_right(filt, num_partitions), join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def rev_sum(g: pa.Table) -> pa.Table:
        t = g.group_by(["l_orderkey", "o_orderdate_days"]).aggregate(
            [("rev", "sum")]
        )
        return pa.table(
            {"o_orderkey": t.column("l_orderkey").cast(pa.int64()),
             "revenue_t2": t.column("rev_sum").cast(pa.int64()),
             "o_orderdate_days": t.column("o_orderdate_days").cast(pa.int64())}
        )

    def add_opart(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy().astype(np.uint64)
        part = ((ok * np.uint64(0x9E3779B97F4A7C15))
                % np.uint64(num_partitions)).astype(np.int32)
        return b.append_column("part", pa.array(part, pa.int32()))

    per_order = (
        joined.map_batches(add_opart, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: rev_sum(g.drop_columns(["part"])),
                    batch_format="pyarrow")
    )
    # top-n: per-block partials (tie-inclusive) then one tiny driver sort
    parts = []
    for b in per_order.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        rev = b.column("revenue_t2").to_numpy()
        if rev.size > n:
            kth = np.partition(rev, rev.size - n)[rev.size - n]
            b = b.filter(pa.array(rev >= kth))
        parts.append(b)
    if not parts:
        return pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "revenue_t2": pa.array([], pa.int64()),
             "o_orderdate_days": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(parts)
    rev = t.column("revenue_t2").to_numpy()
    ok = t.column("o_orderkey").to_numpy()
    order = np.lexsort((ok, -rev))[:n]
    t = t.take(pa.array(order))
    return t.select(["o_orderkey", "revenue_t2", "o_orderdate_days"])


def revenue_by_nation(
    orders: "ray.data.Dataset",
    customer: "ray.data.Dataset",
    nation: "ray.data.Dataset",
    *,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Grouped revenue by customer nation — the broadcast-small-side
    join pattern: nation (25 rows) and the custkey->nationkey map ride
    one ray.put each; orders never shuffle on the join key, only the
    per-batch (nation, sum) partials move. Output
    (n_name, n_orders, revenue_t2) with revenue = sum of
    floor(o_totalprice*100).

    At 10^9+ customers the custkey map outgrows a broadcast — swap the
    map for a partitioned Dataset.join (top_order_revenue shows that
    form); the nation side stays broadcast at any scale.
    """
    nmap = {}
    for b in nation.select_columns(["n_nationkey", "n_name"]).iter_batches(
        batch_format="pyarrow"
    ):
        nmap.update(zip(b.column("n_nationkey").to_pylist(),
                        b.column("n_name").to_pylist()))
    ck, nk = [], []
    for b in customer.select_columns(["c_custkey", "c_nationkey"]).iter_batches(
        batch_format="pyarrow"
    ):
        ck.append(b.column("c_custkey").to_numpy().astype(np.int64))
        nk.append(b.column("c_nationkey").to_numpy().astype(np.int64))
    ck = np.concatenate(ck) if ck else np.empty(0, np.int64)
    nk = np.concatenate(nk) if nk else np.empty(0, np.int64)
    order = np.argsort(ck)
    cust_ref = ray.put((ck[order], nk[order], nmap))

    def partial(b: pa.Table) -> pa.Table:
        ck_s, nk_s, names = ray.get(cust_ref)
        keys = b.column("o_custkey").to_numpy()
        tp = b.column("o_totalprice").to_numpy()
        pos = np.searchsorted(ck_s, keys)
        pos = np.minimum(pos, max(ck_s.size - 1, 0))
        ok = (ck_s[pos] == keys) if ck_s.size else np.zeros(keys.size, bool)
        nkey = np.where(ok, nk_s[pos] if nk_s.size else 0, -1)
        t = pa.table(
            {"nkey": pa.array(nkey.astype(np.int64)),
             "one": pa.array(np.ones(keys.size, np.int64)),
             "rev": pa.array(np.floor(tp * 100.0).astype(np.int64))}
        ).filter(pc.field("nkey") >= 0) if keys.size else None
        if t is None or t.num_rows == 0:
            return pa.table(
                {"n_name": pa.array([], pa.string()),
                 "n_orders": pa.array([], pa.int64()),
                 "revenue_t2": pa.array([], pa.int64())}
            )
        t = t.group_by(["nkey"]).aggregate([("one", "sum"), ("rev", "sum")])
        return pa.table(
            {"n_name": pa.array(
                [names.get(int(x), "") for x in t.column("nkey").to_pylist()],
                pa.string()),
             "n_orders": t.column("one_sum").cast(pa.int64()),
             "revenue_t2": t.column("rev_sum").cast(pa.int64())}
        )

    def final(g: pa.Table) -> pa.Table:
        t = g.group_by(["n_name"]).aggregate(
            [("n_orders", "sum"), ("revenue_t2", "sum")]
        )
        return pa.table(
            {"n_name": t.column("n_name"),
             "n_orders": t.column("n_orders_sum").cast(pa.int64()),
             "revenue_t2": t.column("revenue_t2_sum").cast(pa.int64())}
        )

    def add_npart(b: pa.Table) -> pa.Table:
        import zlib

        part = pa.array(
            [zlib.crc32(x.encode()) % num_partitions
             for x in b.column("n_name").to_pylist()],
            pa.int32(),
        )
        return b.append_column("part", part)

    return (
        orders.select_columns(["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(add_npart, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: final(g.drop_columns(["part"])),
                    batch_format="pyarrow")
    )
