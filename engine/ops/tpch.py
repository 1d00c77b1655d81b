"""TPC-H-shaped multi-table analytical pipelines (Q5/Q6/Q9/Q10/Q14/Q17/Q18
analogues over the synthetic star schema).

These complete the relational surface with the classic JOIN-CHAIN shapes the
single-table ops in ``relational.py`` don't exercise: three-exchange
customer→orders→lineitem→supplier chains (q5), fact⋈fact co-partitions with
per-bucket semi-filters (q9, q10, q18), a row-level predicate that depends on
a per-key aggregate (q17 — the one shape that must ship slim fact rows), and
global conditional ratios (q6, q14).

100 TB shapes (shared discipline with relational.py's module docstring):

- Every fact⋈fact join is a *bucketed co-partition*: the sides union into one
  null-padded schema and ONE ``groupby(key & (nb-1))`` exchange resolves the
  join per bucket with vectorized Arrow kernels (``is_in`` semi-filters,
  ``group_by`` folds).  No driver-side fact reads, no per-key map_groups tax.
- lineitem NEVER crosses an exchange raw when the downstream needs only
  aggregates: a per-(block, key) Arrow ``group_by`` combiner runs inside
  map_batches first, so exchanges move one partial row per (key, block).
  The single exception is q17, whose predicate (``l_quantity <
  frac·avg(qty per part)``) is row-level against a group aggregate — there
  the exchange ships a 3-column slim projection once, the textbook
  shuffle-join lower bound for that semantics.
- TRUE dimension tables (nation, region — ≤25 rows by schema) are read
  driver-side and resolved via tiny in-task lookups; customer / supplier /
  part all SCALE with sf and ride the co-partition exchanges instead.
- Chained joins REUSE the partial-aggregate discipline between hops: each
  bucket re-aggregates to the NEXT hop's key before emitting, so exchange N+1
  moves per-(key, bucket) partials, never row multiplicities.
- ``num_buckets`` scales with the cluster, not the data; per-bucket work is
  C++ (Arrow group_by / is_in / sort) so a bucket is O(its rows), and bucket
  skew is bounded by key-hash uniformity over orderkey/custkey/partkey/
  suppkey — the natural uniform keys of the schema.

Reference surface: the reference engine (cmlburnett/pypdfproc) has no
relational layer — these ops extend the engine beyond the reference per the
round briefs (SURVEY.md §2.9's plan-op layer).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .common import read_small_table, read_table, round_half_up

__all__ = ['q4_order_priority', 'q5_local_supplier_volume',
           'q6_forecast_revenue', 'q7_volume_shipping', 'q8_market_share',
           'q9_product_profit', 'q10_returned_item',
           'q13_order_count_distribution', 'q14_promo_revenue',
           'q15_top_supplier', 'q17_small_quantity_revenue',
           'q18_large_volume_customer', 'q19_discounted_revenue',
           'q22_global_sales_opportunity']


def _ts(datestr):
    return pa.scalar(np.datetime64(datestr + 'T00:00:00', 'us'),
                     pa.timestamp('us'))


def _cents(x):
    """Per-ROW half-up quantization to integer cents (int64).

    Money sums here accumulate as INTEGERS, not doubles: a double sum is
    order-dependent, and Ray's fold order (union arrival → bucket fold)
    differs from DuckDB's — a sum landing near a .005 boundary then
    round-flips between engine and oracle (caught live on q9 at sf0.01:
    988115.5 vs 988115.49).  Per-row ``floor(x·100 + 0.5)`` is identical
    IEEE ops on identical input doubles on BOTH sides, and integer
    addition is associative, so every downstream sum is exact and
    order-free (the similarity.py micro-unit discipline)."""
    return pc.cast(pc.floor(pc.add(pc.multiply(x, pa.scalar(100.0)),
                                   pa.scalar(0.5))), pa.int64())


def _rev_cents(batch, price='l_extendedprice', disc='l_discount'):
    return _cents(pc.multiply(batch.column(price),
                              pc.subtract(pa.scalar(1.0),
                                          batch.column(disc))))


def _seed_row(**cols):
    """One all-zero combiner row unioned into every constant-key scalar
    fold: SQL aggregates without GROUP BY return exactly ONE row even on
    empty input, so the Ray side must too (otherwise a degenerate filter
    window yields 0 rows vs the oracle's 1)."""
    import ray.data
    return ray.data.from_arrow(pa.table(
        {k: pa.array([v], pa.int64()) for k, v in cols.items()}))


def _bucket(int_col, nb):
    return pa.array(int_col.to_numpy(zero_copy_only=False) & (nb - 1),
                    pa.int64())


def _region_nationkeys(sf_dir, region):
    """Driver-side dim lookup: the set of nationkeys in ``region`` plus the
    nationkey→name map (nation/region are ≤25/5 rows by schema)."""
    nat = read_small_table(sf_dir, 'nation')
    reg = read_small_table(sf_dir, 'region')
    rkey = {r['r_name']: r['r_regionkey'] for r in reg.to_pylist()}[region]
    names = {}
    keys = set()
    for r in nat.to_pylist():
        names[r['n_nationkey']] = r['n_name']
        if r['n_regionkey'] == rkey:
            keys.add(r['n_nationkey'])
    return keys, names


def q5_local_supplier_volume(sf_dir, region='ASIA', date_from='1996-01-01',
                             date_to='1997-01-01', num_buckets=64):
    """TPC-H Q5 analogue: revenue per nation from orders where the customer
    and the supplier sit in the SAME nation of one region, order date in a
    window.  Three chained bucketed co-partitions — custkey, orderkey,
    suppkey — each hop re-aggregated to the next hop's key:

      1. customer (region-filtered map-side via the ≤25-key nation set) ⋈
         orders (date-filtered at the read edge) on custkey →
         (o_orderkey, cust_nationkey);
      2. that ⋈ lineitem combiner rows (rev per (block, orderkey, suppkey))
         on orderkey → per-(suppkey, nationkey) rev partials per bucket;
      3. that ⋈ supplier on suppkey, keep s_nationkey == cust_nationkey →
         per-nation partials; tiny final groupby + name lookup.
    """
    nb = num_buckets
    region_keys, names = _region_nationkeys(sf_dir, region)
    lo, hi = _ts(date_from), _ts(date_to)

    # hop 1: custkey co-partition -----------------------------------------
    def cust_rows(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column('c_nationkey'),
                        value_set=pa.array(sorted(region_keys), pa.int32()))
        t = batch.filter(mask)
        ck = t.column('c_custkey')
        return pa.table({
            'key': ck,
            'o_orderkey': pa.nulls(t.num_rows, pa.int64()),
            'nationkey': pc.cast(t.column('c_nationkey'), pa.int64()),
            'bucket': _bucket(ck, nb),
        })

    def order_rows(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch.column('o_orderdate'), lo),
                    pc.less(batch.column('o_orderdate'), hi))
        t = batch.filter(m)
        return pa.table({
            'key': t.column('o_custkey'),
            'o_orderkey': t.column('o_orderkey'),
            'nationkey': pa.nulls(t.num_rows, pa.int64()),
            'bucket': _bucket(t.column('o_custkey'), nb),
        })

    _H1_EMPTY = pa.table({'o_orderkey': pa.array([], pa.int64()),
                          'nationkey': pa.array([], pa.int64()),
                          'obucket': pa.array([], pa.int64())})

    def hop1(group: pa.Table) -> pa.Table:
        is_cust = pc.is_null(group.column('o_orderkey'))
        cust = group.filter(is_cust)
        orders = group.filter(pc.invert(is_cust))
        if cust.num_rows == 0 or orders.num_rows == 0:
            return _H1_EMPTY
        # custkey → nationkey map resolved vectorized via index_in
        pos = pc.index_in(orders.column('key'), value_set=cust.column('key'))
        hit = pc.is_valid(pos)
        orders, pos = orders.filter(hit), pos.filter(hit)
        ok = orders.column('o_orderkey')
        return pa.table({
            'o_orderkey': ok,
            'nationkey': pc.take(cust.column('nationkey'), pos),
            'obucket': _bucket(ok, nb),
        })

    cust = read_table(sf_dir, 'customer', columns=['c_custkey', 'c_nationkey'])
    orders = read_table(sf_dir, 'orders',
                        columns=['o_orderkey', 'o_custkey', 'o_orderdate'])
    order_nat = cust.map_batches(cust_rows, batch_format='pyarrow',
                                 zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format='pyarrow',
                           zero_copy_batch=True)
    ).groupby('bucket').map_groups(hop1, batch_format='pyarrow')

    # hop 2: orderkey co-partition ----------------------------------------
    def onat_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'o_orderkey': batch.column('o_orderkey'),
            'suppkey': pa.nulls(batch.num_rows, pa.int64()),
            'nationkey': batch.column('nationkey'),
            'rev': pa.nulls(batch.num_rows, pa.int64()),
            'obucket': batch.column('obucket'),
        })

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({'o_orderkey': batch.column('l_orderkey'),
                      'suppkey': batch.column('l_suppkey'),
                      'rev': _rev_cents(batch)})
        g = t.group_by(['o_orderkey', 'suppkey']).aggregate([('rev', 'sum')])
        g = g.rename_columns(['o_orderkey', 'suppkey', 'rev'])
        return pa.table({
            'o_orderkey': g.column('o_orderkey'),
            'suppkey': g.column('suppkey'),
            'nationkey': pa.nulls(g.num_rows, pa.int64()),
            'rev': g.column('rev'),
            'obucket': _bucket(g.column('o_orderkey'), nb),
        })

    _H2_EMPTY = pa.table({'suppkey': pa.array([], pa.int64()),
                          'nationkey': pa.array([], pa.int64()),
                          'rev': pa.array([], pa.int64()),
                          'sbucket': pa.array([], pa.int64())})

    def hop2(group: pa.Table) -> pa.Table:
        is_key = pc.is_null(group.column('rev'))
        keys = group.filter(is_key)
        li = group.filter(pc.invert(is_key))
        if keys.num_rows == 0 or li.num_rows == 0:
            return _H2_EMPTY
        pos = pc.index_in(li.column('o_orderkey'),
                          value_set=keys.column('o_orderkey'))
        hit = pc.is_valid(pos)
        li, pos = li.filter(hit), pos.filter(hit)
        t = pa.table({'suppkey': li.column('suppkey'),
                      'nationkey': pc.take(keys.column('nationkey'), pos),
                      'rev': li.column('rev')})
        # re-aggregate to the NEXT hop's key before emitting
        g = t.group_by(['suppkey', 'nationkey']).aggregate([('rev', 'sum')])
        g = g.rename_columns(['suppkey', 'nationkey', 'rev'])
        return g.append_column('sbucket', _bucket(g.column('suppkey'), nb))

    li = read_table(sf_dir, 'lineitem',
                    columns=['l_orderkey', 'l_suppkey', 'l_extendedprice',
                             'l_discount'])
    supp_nat = order_nat.map_batches(onat_rows, batch_format='pyarrow',
                                     zero_copy_batch=True).union(
        li.map_batches(li_partial, batch_format='pyarrow',
                       zero_copy_batch=True)
    ).groupby('obucket').map_groups(hop2, batch_format='pyarrow')

    # hop 3: suppkey co-partition ------------------------------------------
    def supp_rows(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column('s_nationkey'),
                        value_set=pa.array(sorted(region_keys), pa.int32()))
        t = batch.filter(mask)
        sk = t.column('s_suppkey')
        return pa.table({
            'suppkey': sk,
            's_nationkey': pc.cast(t.column('s_nationkey'), pa.int64()),
            'nationkey': pa.nulls(t.num_rows, pa.int64()),
            'rev': pa.nulls(t.num_rows, pa.int64()),
            'sbucket': _bucket(sk, nb),
        })

    def part_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'suppkey': batch.column('suppkey'),
            's_nationkey': pa.nulls(batch.num_rows, pa.int64()),
            'nationkey': batch.column('nationkey'),
            'rev': batch.column('rev'),
            'sbucket': batch.column('sbucket'),
        })

    _H3_EMPTY = pa.table({'nationkey': pa.array([], pa.int64()),
                          'rev': pa.array([], pa.int64())})

    def hop3(group: pa.Table) -> pa.Table:
        is_supp = pc.is_null(group.column('rev'))
        supp = group.filter(is_supp)
        parts = group.filter(pc.invert(is_supp))
        if supp.num_rows == 0 or parts.num_rows == 0:
            return _H3_EMPTY
        pos = pc.index_in(parts.column('suppkey'),
                          value_set=supp.column('suppkey'))
        hit = pc.is_valid(pos)
        parts, pos = parts.filter(hit), pos.filter(hit)
        snat = pc.take(supp.column('s_nationkey'), pos)
        local = pc.equal(snat, parts.column('nationkey'))
        parts = parts.filter(local)
        if parts.num_rows == 0:
            return _H3_EMPTY
        g = parts.select(['nationkey', 'rev']).group_by(
            'nationkey').aggregate([('rev', 'sum')])
        return g.rename_columns(['nationkey', 'rev'])

    supp = read_table(sf_dir, 'supplier', columns=['s_suppkey', 's_nationkey'])
    per_nation = supp.map_batches(supp_rows, batch_format='pyarrow',
                                  zero_copy_batch=True).union(
        supp_nat.map_batches(part_rows, batch_format='pyarrow',
                             zero_copy_batch=True)
    ).groupby('sbucket').map_groups(hop3, batch_format='pyarrow')

    def final(group: pa.Table) -> pa.Table:
        nk = group.column('nationkey')[0].as_py()
        rev = pc.sum(group.column('rev')).as_py() or 0
        return pa.table({
            'n_name': pa.array([names[nk]], pa.string()),
            'revenue': pa.array([rev / 100.0], pa.float64()),
        })

    return (per_nation.groupby('nationkey')
            .map_groups(final, batch_format='pyarrow')
            .sort(['revenue', 'n_name'], descending=[True, False]))


def q6_forecast_revenue(sf_dir, date_from='1996-01-01', date_to='1997-01-01',
                        disc_lo=0.05, disc_hi=0.07, qty_max=24.0):
    """TPC-H Q6: one-row conditional revenue scan over lineitem — pure
    filter → per-block combiner → constant-key fold (one row per block
    crosses the exchange)."""
    lo, hi = _ts(date_from), _ts(date_to)
    eps = 1e-9   # float discount grid: include the endpoints robustly

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column('l_discount')
        m = pc.and_(pc.and_(
            pc.greater_equal(batch.column('l_shipdate'), lo),
            pc.less(batch.column('l_shipdate'), hi)), pc.and_(
            pc.and_(pc.greater_equal(d, pa.scalar(disc_lo - eps)),
                    pc.less_equal(d, pa.scalar(disc_hi + eps))),
            pc.less(batch.column('l_quantity'), pa.scalar(qty_max))))
        t = batch.filter(m)
        rev = pc.sum(_cents(pc.multiply(t.column('l_extendedprice'),
                                        t.column('l_discount')))).as_py() or 0
        return pa.table({'k': pa.array([0], pa.int64()),
                         'rev': pa.array([rev], pa.int64()),
                         'n': pa.array([t.num_rows], pa.int64())})

    def final(group: pa.Table) -> pa.Table:
        rev = pc.sum(group.column('rev')).as_py() or 0
        n = pc.sum(group.column('n')).as_py() or 0
        return pa.table({
            'revenue': pa.array([rev / 100.0], pa.float64()),
            'n_items': pa.array([n], pa.int64()),
        })

    ds = read_table(sf_dir, 'lineitem',
                    columns=['l_shipdate', 'l_discount', 'l_quantity',
                             'l_extendedprice'])
    return (ds.map_batches(partial, batch_format='pyarrow',
                           zero_copy_batch=True)
            .union(_seed_row(k=0, rev=0, n=0))
            .groupby('k').map_groups(final, batch_format='pyarrow'))


def q9_product_profit(sf_dir, ptype='PROMO', num_buckets=64):
    """TPC-H Q9 analogue: profit per (supplier nation, ship year) over parts
    of one type.  part⋈lineitem co-partition on partkey (semi-filter), then
    re-aggregated partials ⋈ supplier on suppkey; nation resolved from the
    ≤25-row dim driver-side."""
    nb = num_buckets
    _, names = _region_nationkeys(sf_dir, 'ASIA')   # full nationkey→name map

    def part_keys(batch: pa.Table) -> pa.Table:
        keys = batch.filter(pc.equal(batch.column('p_type'),
                                     ptype)).column('p_partkey')
        return pa.table({
            'partkey': keys,
            'suppkey': pa.nulls(len(keys), pa.int64()),
            'year': pa.nulls(len(keys), pa.int64()),
            'profit': pa.nulls(len(keys), pa.int64()),
            'pbucket': _bucket(keys, nb),
        })

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            'partkey': batch.column('l_partkey'),
            'suppkey': batch.column('l_suppkey'),
            'year': pc.cast(pc.year(batch.column('l_shipdate')), pa.int64()),
            'profit': _rev_cents(batch),
        })
        g = t.group_by(['partkey', 'suppkey', 'year']).aggregate(
            [('profit', 'sum')])
        g = g.rename_columns(['partkey', 'suppkey', 'year', 'profit'])
        return g.append_column('pbucket', _bucket(g.column('partkey'), nb))

    _H1_EMPTY = pa.table({'suppkey': pa.array([], pa.int64()),
                          'year': pa.array([], pa.int64()),
                          'profit': pa.array([], pa.int64()),
                          'sbucket': pa.array([], pa.int64())})

    def hop1(group: pa.Table) -> pa.Table:
        is_key = pc.is_null(group.column('profit'))
        keyset = group.filter(is_key).column('partkey')
        li = group.filter(pc.invert(is_key))
        li = li.filter(pc.is_in(li.column('partkey'), value_set=keyset))
        if li.num_rows == 0:
            return _H1_EMPTY
        g = li.select(['suppkey', 'year', 'profit']).group_by(
            ['suppkey', 'year']).aggregate([('profit', 'sum')])
        g = g.rename_columns(['suppkey', 'year', 'profit'])
        return g.append_column('sbucket', _bucket(g.column('suppkey'), nb))

    part = read_table(sf_dir, 'part', columns=['p_partkey', 'p_type'])
    li = read_table(sf_dir, 'lineitem',
                    columns=['l_partkey', 'l_suppkey', 'l_shipdate',
                             'l_extendedprice', 'l_discount'])
    partials = part.map_batches(part_keys, batch_format='pyarrow',
                                zero_copy_batch=True).union(
        li.map_batches(li_partial, batch_format='pyarrow',
                       zero_copy_batch=True)
    ).groupby('pbucket').map_groups(hop1, batch_format='pyarrow')

    def supp_rows(batch: pa.Table) -> pa.Table:
        sk = batch.column('s_suppkey')
        return pa.table({
            'suppkey': sk,
            's_nationkey': pc.cast(batch.column('s_nationkey'), pa.int64()),
            'year': pa.nulls(len(sk), pa.int64()),
            'profit': pa.nulls(len(sk), pa.int64()),
            'sbucket': _bucket(sk, nb),
        })

    def mid_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'suppkey': batch.column('suppkey'),
            's_nationkey': pa.nulls(batch.num_rows, pa.int64()),
            'year': batch.column('year'),
            'profit': batch.column('profit'),
            'sbucket': batch.column('sbucket'),
        })

    _H2_EMPTY = pa.table({'nationkey': pa.array([], pa.int64()),
                          'year': pa.array([], pa.int64()),
                          'profit': pa.array([], pa.int64())})

    def hop2(group: pa.Table) -> pa.Table:
        is_supp = pc.is_null(group.column('profit'))
        supp = group.filter(is_supp)
        mids = group.filter(pc.invert(is_supp))
        if supp.num_rows == 0 or mids.num_rows == 0:
            return _H2_EMPTY
        pos = pc.index_in(mids.column('suppkey'),
                          value_set=supp.column('suppkey'))
        hit = pc.is_valid(pos)
        mids, pos = mids.filter(hit), pos.filter(hit)
        t = pa.table({'nationkey': pc.take(supp.column('s_nationkey'), pos),
                      'year': mids.column('year'),
                      'profit': mids.column('profit')})
        g = t.group_by(['nationkey', 'year']).aggregate([('profit', 'sum')])
        return g.rename_columns(['nationkey', 'year', 'profit'])

    supp = read_table(sf_dir, 'supplier', columns=['s_suppkey', 's_nationkey'])
    per_ny = supp.map_batches(supp_rows, batch_format='pyarrow',
                              zero_copy_batch=True).union(
        partials.map_batches(mid_rows, batch_format='pyarrow',
                             zero_copy_batch=True)
    ).groupby('sbucket').map_groups(hop2, batch_format='pyarrow')

    def final(group: pa.Table) -> pa.Table:
        nk = group.column('nationkey')[0].as_py()
        yr = group.column('year')[0].as_py()
        profit = pc.sum(group.column('profit')).as_py() or 0
        return pa.table({
            'n_name': pa.array([names[nk]], pa.string()),
            'o_year': pa.array([yr], pa.int64()),
            'profit': pa.array([profit / 100.0], pa.float64()),
        })

    return (per_ny.groupby(['nationkey', 'year'])
            .map_groups(final, batch_format='pyarrow')
            .sort(['n_name', 'o_year'], descending=[False, True]))


def q10_returned_item(sf_dir, topk=20, num_buckets=64):
    """TPC-H Q10 analogue: top-k customers by revenue lost to returned items
    (l_returnflag = 'R').  lineitem combiner ⋈ orders on orderkey →
    per-custkey partials ⋈ customer on custkey → per-bucket top-k
    (rev desc, custkey asc) caps the global sort at buckets × k rows."""
    nb = num_buckets
    _, names = _region_nationkeys(sf_dir, 'ASIA')

    def li_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column('l_returnflag'), 'R'))
        g = pa.table({'o_orderkey': t.column('l_orderkey'),
                      'rev': _rev_cents(t)}) \
            .group_by('o_orderkey').aggregate([('rev', 'sum')])
        g = g.rename_columns(['o_orderkey', 'rev'])
        return pa.table({
            'o_orderkey': g.column('o_orderkey'),
            'custkey': pa.nulls(g.num_rows, pa.int64()),
            'rev': g.column('rev'),
            'obucket': _bucket(g.column('o_orderkey'), nb),
        })

    def order_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'o_orderkey': batch.column('o_orderkey'),
            'custkey': batch.column('o_custkey'),
            'rev': pa.nulls(batch.num_rows, pa.int64()),
            'obucket': _bucket(batch.column('o_orderkey'), nb),
        })

    _H1_EMPTY = pa.table({'custkey': pa.array([], pa.int64()),
                          'rev': pa.array([], pa.int64()),
                          'cbucket': pa.array([], pa.int64())})

    def hop1(group: pa.Table) -> pa.Table:
        is_order = pc.is_null(group.column('rev'))
        orders = group.filter(is_order)
        li = group.filter(pc.invert(is_order))
        if orders.num_rows == 0 or li.num_rows == 0:
            return _H1_EMPTY
        pos = pc.index_in(li.column('o_orderkey'),
                          value_set=orders.column('o_orderkey'))
        hit = pc.is_valid(pos)
        li, pos = li.filter(hit), pos.filter(hit)
        t = pa.table({'custkey': pc.take(orders.column('custkey'), pos),
                      'rev': li.column('rev')})
        g = t.group_by('custkey').aggregate([('rev', 'sum')])
        g = g.rename_columns(['custkey', 'rev'])
        return g.append_column('cbucket', _bucket(g.column('custkey'), nb))

    li = read_table(sf_dir, 'lineitem',
                    columns=['l_orderkey', 'l_returnflag', 'l_extendedprice',
                             'l_discount'])
    orders = read_table(sf_dir, 'orders', columns=['o_orderkey', 'o_custkey'])
    per_cust = li.map_batches(li_partial, batch_format='pyarrow',
                              zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format='pyarrow',
                           zero_copy_batch=True)
    ).groupby('obucket').map_groups(hop1, batch_format='pyarrow')

    def cust_rows(batch: pa.Table) -> pa.Table:
        ck = batch.column('c_custkey')
        return pa.table({
            'custkey': ck,
            'c_name': batch.column('c_name'),
            'c_acctbal': batch.column('c_acctbal'),
            'c_nationkey': pc.cast(batch.column('c_nationkey'), pa.int64()),
            'rev': pa.nulls(len(ck), pa.int64()),
            'cbucket': _bucket(ck, nb),
        })

    def rev_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'custkey': batch.column('custkey'),
            'c_name': pa.nulls(batch.num_rows, pa.string()),
            'c_acctbal': pa.nulls(batch.num_rows, pa.float64()),
            'c_nationkey': pa.nulls(batch.num_rows, pa.int64()),
            'rev': batch.column('rev'),
            'cbucket': batch.column('cbucket'),
        })

    _H2_EMPTY = pa.table({'c_custkey': pa.array([], pa.int64()),
                          'c_name': pa.array([], pa.string()),
                          'rev_raw': pa.array([], pa.int64()),
                          'c_acctbal': pa.array([], pa.float64()),
                          'c_nationkey': pa.array([], pa.int64())})

    def hop2_topk(group: pa.Table) -> pa.Table:
        is_cust = pc.invert(pc.is_null(group.column('c_name')))
        cust = group.filter(is_cust)
        revs = group.filter(pc.invert(is_cust))
        if cust.num_rows == 0 or revs.num_rows == 0:
            return _H2_EMPTY
        g = revs.select(['custkey', 'rev']).group_by('custkey').aggregate(
            [('rev', 'sum')]).rename_columns(['custkey', 'rev_raw'])
        pos = pc.index_in(g.column('custkey'), value_set=cust.column('custkey'))
        hit = pc.is_valid(pos)
        g, pos = g.filter(hit), pos.filter(hit)
        t = pa.table({
            'c_custkey': g.column('custkey'),
            'c_name': pc.take(cust.column('c_name'), pos),
            'rev_raw': g.column('rev_raw'),
            'c_acctbal': pc.take(cust.column('c_acctbal'), pos),
            'c_nationkey': pc.take(cust.column('c_nationkey'), pos),
        })
        return t.sort_by([('rev_raw', 'descending'),
                          ('c_custkey', 'ascending')]).slice(0, topk)

    cust = read_table(sf_dir, 'customer',
                      columns=['c_custkey', 'c_name', 'c_acctbal',
                               'c_nationkey'])
    top = cust.map_batches(cust_rows, batch_format='pyarrow',
                           zero_copy_batch=True).union(
        per_cust.map_batches(rev_rows, batch_format='pyarrow',
                             zero_copy_batch=True)
    ).groupby('cbucket').map_groups(hop2_topk, batch_format='pyarrow') \
        .sort(['rev_raw', 'c_custkey'], descending=[True, False]).limit(topk)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            'c_custkey': batch.column('c_custkey'),
            'c_name': batch.column('c_name'),
            'revenue': pa.array(
                batch.column('rev_raw').to_numpy(zero_copy_only=False)
                / 100.0, pa.float64()),
            'c_acctbal': batch.column('c_acctbal'),
            'n_name': pa.array(
                [names[k] for k in
                 batch.column('c_nationkey').to_pylist()], pa.string()),
        })

    return top.map_batches(finish, batch_format='pyarrow')


def q14_promo_revenue(sf_dir, date_from='1996-03-01', date_to='1996-04-01',
                      num_buckets=64):
    """TPC-H Q14: promo revenue share — lineitem (date window) ⋈ part on
    partkey, conditional on p_type = 'PROMO'.  One bucketed co-partition;
    each bucket emits ONE (promo, total) row; the final fold computes
    100·promo/total."""
    nb = num_buckets
    lo, hi = _ts(date_from), _ts(date_to)

    def part_rows(batch: pa.Table) -> pa.Table:
        pk = batch.column('p_partkey')
        return pa.table({
            'partkey': pk,
            'is_promo': pc.equal(batch.column('p_type'), 'PROMO'),
            'rev': pa.nulls(len(pk), pa.int64()),
            'pbucket': _bucket(pk, nb),
        })

    def li_partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch.column('l_shipdate'), lo),
                    pc.less(batch.column('l_shipdate'), hi))
        t = batch.filter(m)
        g = pa.table({'partkey': t.column('l_partkey'),
                      'rev': _rev_cents(t)}) \
            .group_by('partkey').aggregate([('rev', 'sum')])
        g = g.rename_columns(['partkey', 'rev'])
        return pa.table({
            'partkey': g.column('partkey'),
            'is_promo': pa.nulls(g.num_rows, pa.bool_()),
            'rev': g.column('rev'),
            'pbucket': _bucket(g.column('partkey'), nb),
        })

    def bucket_fold(group: pa.Table) -> pa.Table:
        is_part = pc.is_null(group.column('rev'))
        parts = group.filter(is_part)
        li = group.filter(pc.invert(is_part))
        if parts.num_rows == 0 or li.num_rows == 0:
            return pa.table({'k': pa.array([], pa.int64()),
                             'promo': pa.array([], pa.int64()),
                             'total': pa.array([], pa.int64())})
        pos = pc.index_in(li.column('partkey'),
                          value_set=parts.column('partkey'))
        hit = pc.is_valid(pos)
        li, pos = li.filter(hit), pos.filter(hit)
        promo_mask = pc.take(parts.column('is_promo'), pos)
        total = pc.sum(li.column('rev')).as_py() or 0
        promo = pc.sum(li.filter(promo_mask).column('rev')).as_py() or 0
        return pa.table({'k': pa.array([0], pa.int64()),
                         'promo': pa.array([promo], pa.int64()),
                         'total': pa.array([total], pa.int64())})

    part = read_table(sf_dir, 'part', columns=['p_partkey', 'p_type'])
    li = read_table(sf_dir, 'lineitem',
                    columns=['l_partkey', 'l_shipdate', 'l_extendedprice',
                             'l_discount'])
    per_bucket = part.map_batches(part_rows, batch_format='pyarrow',
                                  zero_copy_batch=True).union(
        li.map_batches(li_partial, batch_format='pyarrow',
                       zero_copy_batch=True)
    ).groupby('pbucket').map_groups(bucket_fold, batch_format='pyarrow')

    def final(group: pa.Table) -> pa.Table:
        promo = pc.sum(group.column('promo')).as_py() or 0
        total = pc.sum(group.column('total')).as_py() or 0
        if total == 0:      # SQL: sum() over empty is NULL, x/NULL is NULL
            share = [None]
        else:
            share = round_half_up([100.0 * promo / total], 6)
        return pa.table({'promo_revenue': pa.array(share, pa.float64())})

    return per_bucket.union(_seed_row(k=0, promo=0, total=0)) \
        .groupby('k').map_groups(final, batch_format='pyarrow')


def q17_small_quantity_revenue(sf_dir, brand='Brand#13', frac=0.2,
                               num_buckets=64):
    """TPC-H Q17 analogue: avg yearly revenue lost if small-quantity orders
    (l_quantity < frac·avg(l_quantity) of that part) for one brand were not
    filled.  The predicate is ROW-level against a PER-PART aggregate, so
    lineitem must cross the exchange as slim (partkey, qty, price) rows —
    the shuffle-join lower bound for this semantics (every other op in this
    module moves combiner rows only; the projection keeps it 3 columns).
    Per bucket: brand semi-filter → per-part avg → row filter → one
    (sum, n) combiner row out."""
    nb = num_buckets

    def part_keys(batch: pa.Table) -> pa.Table:
        keys = batch.filter(pc.equal(batch.column('p_brand'),
                                     brand)).column('p_partkey')
        return pa.table({
            'partkey': keys,
            'qty': pa.nulls(len(keys), pa.float64()),
            'price': pa.nulls(len(keys), pa.int64()),
            'pbucket': _bucket(keys, nb),
        })

    def li_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'partkey': batch.column('l_partkey'),
            'qty': batch.column('l_quantity'),
            'price': _cents(batch.column('l_extendedprice')),
            'pbucket': _bucket(batch.column('l_partkey'), nb),
        })

    def bucket_fold(group: pa.Table) -> pa.Table:
        is_key = pc.is_null(group.column('qty'))
        keyset = group.filter(is_key).column('partkey')
        li = group.filter(pc.invert(is_key))
        li = li.filter(pc.is_in(li.column('partkey'), value_set=keyset))
        empty = pa.table({'k': pa.array([], pa.int64()),
                          'loss': pa.array([], pa.int64())})
        if li.num_rows == 0:
            return empty
        avg = li.select(['partkey', 'qty']).group_by('partkey').aggregate(
            [('qty', 'mean')]).rename_columns(['partkey', 'avg_qty'])
        pos = pc.index_in(li.column('partkey'), value_set=avg.column('partkey'))
        cutoff = pc.multiply(pc.take(avg.column('avg_qty'), pos),
                             pa.scalar(frac))
        small = li.filter(pc.less(li.column('qty'), cutoff))
        if small.num_rows == 0:
            return empty
        return pa.table({
            'k': pa.array([0], pa.int64()),
            'loss': pa.array([pc.sum(small.column('price')).as_py() or 0],
                             pa.int64()),
        })

    part = read_table(sf_dir, 'part', columns=['p_partkey', 'p_brand'])
    li = read_table(sf_dir, 'lineitem',
                    columns=['l_partkey', 'l_quantity', 'l_extendedprice'])
    per_bucket = part.map_batches(part_keys, batch_format='pyarrow',
                                  zero_copy_batch=True).union(
        li.map_batches(li_rows, batch_format='pyarrow', zero_copy_batch=True)
    ).groupby('pbucket').map_groups(bucket_fold, batch_format='pyarrow')

    def final(group: pa.Table) -> pa.Table:
        loss = pc.sum(group.column('loss')).as_py() or 0
        return pa.table({
            'avg_yearly': pa.array(round_half_up([loss / 100.0 / 7.0], 2),
                                   pa.float64()),
        })

    return per_bucket.union(_seed_row(k=0, loss=0)) \
        .groupby('k').map_groups(final, batch_format='pyarrow')


def q18_large_volume_customer(sf_dir, min_qty=250.0, topk=100,
                              num_buckets=64):
    """TPC-H Q18 analogue: orders whose total lineitem quantity exceeds
    ``min_qty``, with customer names.  lineitem per-order qty combiner ⋈
    orders on orderkey (the HAVING filter runs in-bucket, so only
    qualifying orders — a tiny set by construction — reach the custkey
    exchange), then ⋈ customer on custkey; global sort is over the
    qualifying set only."""
    nb = num_buckets

    def li_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({'o_orderkey': batch.column('l_orderkey'),
                      'qty': batch.column('l_quantity')}) \
            .group_by('o_orderkey').aggregate([('qty', 'sum')])
        g = g.rename_columns(['o_orderkey', 'qty'])
        return pa.table({
            'o_orderkey': g.column('o_orderkey'),
            'custkey': pa.nulls(g.num_rows, pa.int64()),
            'o_totalprice': pa.nulls(g.num_rows, pa.float64()),
            'o_orderdate': pa.nulls(g.num_rows, pa.timestamp('us')),
            'qty': g.column('qty'),
            'obucket': _bucket(g.column('o_orderkey'), nb),
        })

    def order_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'o_orderkey': batch.column('o_orderkey'),
            'custkey': batch.column('o_custkey'),
            'o_totalprice': batch.column('o_totalprice'),
            'o_orderdate': batch.column('o_orderdate'),
            'qty': pa.nulls(batch.num_rows, pa.float64()),
            'obucket': _bucket(batch.column('o_orderkey'), nb),
        })

    _H1_EMPTY = pa.table({
        'custkey': pa.array([], pa.int64()),
        'o_orderkey': pa.array([], pa.int64()),
        'o_totalprice': pa.array([], pa.float64()),
        'o_orderdate': pa.array([], pa.timestamp('us')),
        'sum_qty': pa.array([], pa.float64()),
        'cbucket': pa.array([], pa.int64())})

    def hop1(group: pa.Table) -> pa.Table:
        is_order = pc.is_null(group.column('qty'))
        orders = group.filter(is_order)
        li = group.filter(pc.invert(is_order))
        if orders.num_rows == 0 or li.num_rows == 0:
            return _H1_EMPTY
        g = li.select(['o_orderkey', 'qty']).group_by('o_orderkey').aggregate(
            [('qty', 'sum')]).rename_columns(['o_orderkey', 'sum_qty'])
        g = g.filter(pc.greater(g.column('sum_qty'), pa.scalar(min_qty)))
        if g.num_rows == 0:
            return _H1_EMPTY
        pos = pc.index_in(g.column('o_orderkey'),
                          value_set=orders.column('o_orderkey'))
        hit = pc.is_valid(pos)
        g, pos = g.filter(hit), pos.filter(hit)
        ck = pc.take(orders.column('custkey'), pos)
        return pa.table({
            'custkey': ck,
            'o_orderkey': g.column('o_orderkey'),
            'o_totalprice': pc.take(orders.column('o_totalprice'), pos),
            'o_orderdate': pc.take(orders.column('o_orderdate'), pos),
            'sum_qty': g.column('sum_qty'),
            'cbucket': _bucket(ck, nb),
        })

    li = read_table(sf_dir, 'lineitem', columns=['l_orderkey', 'l_quantity'])
    orders = read_table(sf_dir, 'orders',
                        columns=['o_orderkey', 'o_custkey', 'o_totalprice',
                                 'o_orderdate'])
    qual = li.map_batches(li_partial, batch_format='pyarrow',
                          zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format='pyarrow',
                           zero_copy_batch=True)
    ).groupby('obucket').map_groups(hop1, batch_format='pyarrow')

    def cust_rows(batch: pa.Table) -> pa.Table:
        ck = batch.column('c_custkey')
        return pa.table({
            'custkey': ck,
            'c_name': batch.column('c_name'),
            'o_orderkey': pa.nulls(len(ck), pa.int64()),
            'o_totalprice': pa.nulls(len(ck), pa.float64()),
            'o_orderdate': pa.nulls(len(ck), pa.timestamp('us')),
            'sum_qty': pa.nulls(len(ck), pa.float64()),
            'cbucket': _bucket(ck, nb),
        })

    def qual_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'custkey': batch.column('custkey'),
            'c_name': pa.nulls(batch.num_rows, pa.string()),
            'o_orderkey': batch.column('o_orderkey'),
            'o_totalprice': batch.column('o_totalprice'),
            'o_orderdate': batch.column('o_orderdate'),
            'sum_qty': batch.column('sum_qty'),
            'cbucket': batch.column('cbucket'),
        })

    _H2_EMPTY = pa.table({
        'c_name': pa.array([], pa.string()),
        'c_custkey': pa.array([], pa.int64()),
        'o_orderkey': pa.array([], pa.int64()),
        'o_totalprice': pa.array([], pa.float64()),
        'o_orderdate': pa.array([], pa.timestamp('us')),
        'sum_qty': pa.array([], pa.float64())})

    def hop2(group: pa.Table) -> pa.Table:
        is_qual = pc.is_valid(group.column('o_orderkey'))
        qual_t = group.filter(is_qual)
        cust = group.filter(pc.invert(is_qual))
        if qual_t.num_rows == 0 or cust.num_rows == 0:
            return _H2_EMPTY
        pos = pc.index_in(qual_t.column('custkey'),
                          value_set=cust.column('custkey'))
        hit = pc.is_valid(pos)
        qual_t, pos = qual_t.filter(hit), pos.filter(hit)
        return pa.table({
            'c_name': pc.take(cust.column('c_name'), pos),
            'c_custkey': qual_t.column('custkey'),
            'o_orderkey': qual_t.column('o_orderkey'),
            'o_totalprice': qual_t.column('o_totalprice'),
            'o_orderdate': qual_t.column('o_orderdate'),
            'sum_qty': qual_t.column('sum_qty'),
        })

    cust = read_table(sf_dir, 'customer', columns=['c_custkey', 'c_name'])
    out = cust.map_batches(cust_rows, batch_format='pyarrow',
                           zero_copy_batch=True).union(
        qual.map_batches(qual_rows, batch_format='pyarrow',
                         zero_copy_batch=True)
    ).groupby('cbucket').map_groups(hop2, batch_format='pyarrow') \
        .sort(['o_totalprice', 'o_orderkey'],
              descending=[True, False]).limit(topk)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            'c_name': batch.column('c_name'),
            'c_custkey': batch.column('c_custkey'),
            'o_orderkey': batch.column('o_orderkey'),
            'o_totalprice': pa.array(round_half_up(
                batch.column('o_totalprice').to_numpy(zero_copy_only=False),
                2), pa.float64()),
            'o_orderdate': batch.column('o_orderdate'),
            'sum_qty': pa.array(round_half_up(
                batch.column('sum_qty').to_numpy(zero_copy_only=False), 2),
                pa.float64()),
        })

    return out.map_batches(finish, batch_format='pyarrow')


def q4_order_priority(sf_dir, date_from='1996-07-01', date_to='1996-10-01',
                      late_days=60, num_buckets=64):
    """TPC-H Q4 analogue (EXISTS semi-join): count orders per priority that
    have at least one lineitem shipped more than ``late_days`` after the
    order date (the schema has no commit/receipt dates; late shipment is
    the analogous exists-predicate).  lineitem compresses to ONE
    max(l_shipdate) combiner row per (block, orderkey); the exists test
    resolves in the orderkey bucket; the final exchange is a tiny
    priority-keyed count fold."""
    nb = num_buckets
    lo, hi = _ts(date_from), _ts(date_to)
    late_us = int(late_days) * 86400 * 1000000

    def li_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({'o_orderkey': batch.column('l_orderkey'),
                      'max_ship': batch.column('l_shipdate')}) \
            .group_by('o_orderkey').aggregate([('max_ship', 'max')])
        g = g.rename_columns(['o_orderkey', 'max_ship'])
        return pa.table({
            'o_orderkey': g.column('o_orderkey'),
            'max_ship': g.column('max_ship'),
            'o_orderdate': pa.nulls(g.num_rows, pa.timestamp('us')),
            'priority': pa.nulls(g.num_rows, pa.string()),
            'obucket': _bucket(g.column('o_orderkey'), nb),
        })

    def order_rows(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch.column('o_orderdate'), lo),
                    pc.less(batch.column('o_orderdate'), hi))
        t = batch.filter(m)
        return pa.table({
            'o_orderkey': t.column('o_orderkey'),
            'max_ship': pa.nulls(t.num_rows, pa.timestamp('us')),
            'o_orderdate': t.column('o_orderdate'),
            'priority': t.column('o_orderpriority'),
            'obucket': _bucket(t.column('o_orderkey'), nb),
        })

    _EMPTY = pa.table({'priority': pa.array([], pa.string()),
                       'n': pa.array([], pa.int64())})

    def hop1(group: pa.Table) -> pa.Table:
        is_order = pc.is_valid(group.column('priority'))
        orders = group.filter(is_order)
        li = group.filter(pc.invert(is_order))
        if orders.num_rows == 0 or li.num_rows == 0:
            return _EMPTY
        g = li.select(['o_orderkey', 'max_ship']).group_by(
            'o_orderkey').aggregate([('max_ship', 'max')])
        g = g.rename_columns(['o_orderkey', 'max_ship'])
        pos = pc.index_in(orders.column('o_orderkey'),
                          value_set=g.column('o_orderkey'))
        hit = pc.is_valid(pos)
        orders, pos = orders.filter(hit), pos.filter(hit)
        ship_us = pc.cast(pc.take(g.column('max_ship'), pos), pa.int64())
        od_us = pc.cast(orders.column('o_orderdate'), pa.int64())
        late = pc.greater(ship_us, pc.add(od_us, pa.scalar(late_us)))
        t = orders.filter(late)
        if t.num_rows == 0:
            return _EMPTY
        g2 = t.select(['priority']).group_by('priority').aggregate(
            [([], 'count_all')])
        g2 = g2.rename_columns(['priority', 'n'])
        return pa.table({'priority': g2.column('priority'),
                         'n': pc.cast(g2.column('n'), pa.int64())})

    li = read_table(sf_dir, 'lineitem', columns=['l_orderkey', 'l_shipdate'])
    orders = read_table(sf_dir, 'orders',
                        columns=['o_orderkey', 'o_orderdate',
                                 'o_orderpriority'])
    per_bucket = li.map_batches(li_partial, batch_format='pyarrow',
                                zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format='pyarrow',
                           zero_copy_batch=True)
    ).groupby('obucket').map_groups(hop1, batch_format='pyarrow')

    def final(group: pa.Table) -> pa.Table:
        return pa.table({
            'o_orderpriority': group.column('priority').slice(0, 1),
            'order_count': pa.array(
                [pc.sum(group.column('n')).as_py() or 0], pa.int64()),
        })

    return (per_bucket.groupby('priority')
            .map_groups(final, batch_format='pyarrow')
            .sort('o_orderpriority'))


def q7_volume_shipping(sf_dir, nation_a='NATION_13', nation_b='NATION_19',
                       num_buckets=64):
    """TPC-H Q7 analogue: revenue between two nations per ship year, keyed
    by (supplier nation, customer nation) ordered pair.  Chain: lineitem ⋈
    supplier on suppkey (supplier side filtered map-side to the two
    nations, so hop-1 partials only carry candidate rows) → ⋈ orders on
    orderkey → ⋈ customer on custkey (also two-nation-filtered) → final
    pair filter n1 ≠ n2 + (year, pair) fold.  Each hop re-aggregates."""
    nb = num_buckets
    _, names = _region_nationkeys(sf_dir, 'ASIA')
    want = {k for k, v in names.items() if v in (nation_a, nation_b)}
    want_arr = pa.array(sorted(want), pa.int32())

    # hop 1: suppkey — attach supplier nation to lineitem partials
    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            'suppkey': batch.column('l_suppkey'),
            'o_orderkey': batch.column('l_orderkey'),
            'year': pc.cast(pc.year(batch.column('l_shipdate')), pa.int64()),
            'rev': _rev_cents(batch),
        })
        g = t.group_by(['suppkey', 'o_orderkey', 'year']).aggregate(
            [('rev', 'sum')])
        g = g.rename_columns(['suppkey', 'o_orderkey', 'year', 'rev'])
        return pa.table({
            'suppkey': g.column('suppkey'),
            'snat': pa.nulls(g.num_rows, pa.int64()),
            'o_orderkey': g.column('o_orderkey'),
            'year': g.column('year'),
            'rev': g.column('rev'),
            'sbucket': _bucket(g.column('suppkey'), nb),
        })

    def supp_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column('s_nationkey'),
                                  value_set=want_arr))
        sk = t.column('s_suppkey')
        return pa.table({
            'suppkey': sk,
            'snat': pc.cast(t.column('s_nationkey'), pa.int64()),
            'o_orderkey': pa.nulls(t.num_rows, pa.int64()),
            'year': pa.nulls(t.num_rows, pa.int64()),
            'rev': pa.nulls(t.num_rows, pa.int64()),
            'sbucket': _bucket(sk, nb),
        })

    _H1_EMPTY = pa.table({'o_orderkey': pa.array([], pa.int64()),
                          'snat': pa.array([], pa.int64()),
                          'year': pa.array([], pa.int64()),
                          'rev': pa.array([], pa.int64()),
                          'obucket': pa.array([], pa.int64())})

    def hop1(group: pa.Table) -> pa.Table:
        is_supp = pc.is_null(group.column('rev'))
        supp = group.filter(is_supp)
        li = group.filter(pc.invert(is_supp))
        if supp.num_rows == 0 or li.num_rows == 0:
            return _H1_EMPTY
        pos = pc.index_in(li.column('suppkey'), value_set=supp.column('suppkey'))
        hit = pc.is_valid(pos)
        li, pos = li.filter(hit), pos.filter(hit)
        t = pa.table({'o_orderkey': li.column('o_orderkey'),
                      'snat': pc.take(supp.column('snat'), pos),
                      'year': li.column('year'), 'rev': li.column('rev')})
        g = t.group_by(['o_orderkey', 'snat', 'year']).aggregate(
            [('rev', 'sum')])
        g = g.rename_columns(['o_orderkey', 'snat', 'year', 'rev'])
        return g.append_column('obucket', _bucket(g.column('o_orderkey'), nb))

    li = read_table(sf_dir, 'lineitem',
                    columns=['l_orderkey', 'l_suppkey', 'l_shipdate',
                             'l_extendedprice', 'l_discount'])
    supp = read_table(sf_dir, 'supplier', columns=['s_suppkey', 's_nationkey'])
    h1 = li.map_batches(li_partial, batch_format='pyarrow',
                        zero_copy_batch=True).union(
        supp.map_batches(supp_rows, batch_format='pyarrow',
                         zero_copy_batch=True)
    ).groupby('sbucket').map_groups(hop1, batch_format='pyarrow')

    # hop 2: orderkey — attach custkey
    def order_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'o_orderkey': batch.column('o_orderkey'),
            'custkey': batch.column('o_custkey'),
            'snat': pa.nulls(batch.num_rows, pa.int64()),
            'year': pa.nulls(batch.num_rows, pa.int64()),
            'rev': pa.nulls(batch.num_rows, pa.int64()),
            'obucket': _bucket(batch.column('o_orderkey'), nb),
        })

    def mid_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'o_orderkey': batch.column('o_orderkey'),
            'custkey': pa.nulls(batch.num_rows, pa.int64()),
            'snat': batch.column('snat'),
            'year': batch.column('year'),
            'rev': batch.column('rev'),
            'obucket': batch.column('obucket'),
        })

    _H2_EMPTY = pa.table({'custkey': pa.array([], pa.int64()),
                          'snat': pa.array([], pa.int64()),
                          'year': pa.array([], pa.int64()),
                          'rev': pa.array([], pa.int64()),
                          'cbucket': pa.array([], pa.int64())})

    def hop2(group: pa.Table) -> pa.Table:
        is_order = pc.is_valid(group.column('custkey'))
        orders = group.filter(is_order)
        mids = group.filter(pc.invert(is_order))
        if orders.num_rows == 0 or mids.num_rows == 0:
            return _H2_EMPTY
        pos = pc.index_in(mids.column('o_orderkey'),
                          value_set=orders.column('o_orderkey'))
        hit = pc.is_valid(pos)
        mids, pos = mids.filter(hit), pos.filter(hit)
        t = pa.table({'custkey': pc.take(orders.column('custkey'), pos),
                      'snat': mids.column('snat'),
                      'year': mids.column('year'),
                      'rev': mids.column('rev')})
        g = t.group_by(['custkey', 'snat', 'year']).aggregate([('rev', 'sum')])
        g = g.rename_columns(['custkey', 'snat', 'year', 'rev'])
        return g.append_column('cbucket', _bucket(g.column('custkey'), nb))

    orders = read_table(sf_dir, 'orders', columns=['o_orderkey', 'o_custkey'])
    h2 = orders.map_batches(order_rows, batch_format='pyarrow',
                            zero_copy_batch=True).union(
        h1.map_batches(mid_rows, batch_format='pyarrow', zero_copy_batch=True)
    ).groupby('obucket').map_groups(hop2, batch_format='pyarrow')

    # hop 3: custkey — attach customer nation, filter the ordered pair
    def cust_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column('c_nationkey'),
                                  value_set=want_arr))
        ck = t.column('c_custkey')
        return pa.table({
            'custkey': ck,
            'cnat': pc.cast(t.column('c_nationkey'), pa.int64()),
            'snat': pa.nulls(t.num_rows, pa.int64()),
            'year': pa.nulls(t.num_rows, pa.int64()),
            'rev': pa.nulls(t.num_rows, pa.int64()),
            'cbucket': _bucket(ck, nb),
        })

    def mid2_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'custkey': batch.column('custkey'),
            'cnat': pa.nulls(batch.num_rows, pa.int64()),
            'snat': batch.column('snat'),
            'year': batch.column('year'),
            'rev': batch.column('rev'),
            'cbucket': batch.column('cbucket'),
        })

    _H3_EMPTY = pa.table({'snat': pa.array([], pa.int64()),
                          'cnat': pa.array([], pa.int64()),
                          'year': pa.array([], pa.int64()),
                          'rev': pa.array([], pa.int64())})

    def hop3(group: pa.Table) -> pa.Table:
        is_cust = pc.is_valid(group.column('cnat'))
        cust = group.filter(is_cust)
        mids = group.filter(pc.invert(is_cust))
        if cust.num_rows == 0 or mids.num_rows == 0:
            return _H3_EMPTY
        pos = pc.index_in(mids.column('custkey'),
                          value_set=cust.column('custkey'))
        hit = pc.is_valid(pos)
        mids, pos = mids.filter(hit), pos.filter(hit)
        cnat = pc.take(cust.column('cnat'), pos)
        keep = pc.not_equal(mids.column('snat'), cnat)
        kept = mids.filter(keep)
        t = pa.table({'snat': kept.column('snat'),
                      'cnat': cnat.filter(keep),
                      'year': kept.column('year'),
                      'rev': kept.column('rev')})
        g = t.group_by(['snat', 'cnat', 'year']).aggregate([('rev', 'sum')])
        return g.rename_columns(['snat', 'cnat', 'year', 'rev'])

    cust = read_table(sf_dir, 'customer', columns=['c_custkey', 'c_nationkey'])
    per = cust.map_batches(cust_rows, batch_format='pyarrow',
                           zero_copy_batch=True).union(
        h2.map_batches(mid2_rows, batch_format='pyarrow',
                       zero_copy_batch=True)
    ).groupby('cbucket').map_groups(hop3, batch_format='pyarrow')

    def final(group: pa.Table) -> pa.Table:
        sn = group.column('snat')[0].as_py()
        cn = group.column('cnat')[0].as_py()
        yr = group.column('year')[0].as_py()
        rev = pc.sum(group.column('rev')).as_py() or 0
        return pa.table({
            'supp_nation': pa.array([names[sn]], pa.string()),
            'cust_nation': pa.array([names[cn]], pa.string()),
            'l_year': pa.array([yr], pa.int64()),
            'revenue': pa.array([rev / 100.0], pa.float64()),
        })

    return (per.groupby(['snat', 'cnat', 'year'])
            .map_groups(final, batch_format='pyarrow')
            .sort(['supp_nation', 'cust_nation', 'l_year']))


def q8_market_share(sf_dir, nation='NATION_6', region='AMERICA',
                    date_from='1996-01-01', date_to='1998-01-01',
                    num_buckets=64):
    """TPC-H Q8 analogue: one nation's share of supplier revenue to one
    region's customers, per order year.  customer(region) ⋈ orders(window)
    on custkey → ⋈ lineitem combiners on orderkey → ⋈ supplier on suppkey;
    the final per-year fold computes share = cents[nation] / cents[all] —
    both integer sums, so the ratio is bit-stable."""
    nb = num_buckets
    region_keys, names = _region_nationkeys(sf_dir, region)
    nat_key = {v: k for k, v in names.items()}[nation]
    lo, hi = _ts(date_from), _ts(date_to)

    # hop 1: custkey → (o_orderkey, o_year)
    def cust_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column('c_nationkey'),
                                  value_set=pa.array(sorted(region_keys),
                                                     pa.int32())))
        ck = t.column('c_custkey')
        return pa.table({
            'key': ck,
            'o_orderkey': pa.nulls(t.num_rows, pa.int64()),
            'o_year': pa.nulls(t.num_rows, pa.int64()),
            'bucket': _bucket(ck, nb),
        })

    def order_rows(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch.column('o_orderdate'), lo),
                    pc.less(batch.column('o_orderdate'), hi))
        t = batch.filter(m)
        return pa.table({
            'key': t.column('o_custkey'),
            'o_orderkey': t.column('o_orderkey'),
            'o_year': pc.cast(pc.year(t.column('o_orderdate')), pa.int64()),
            'bucket': _bucket(t.column('o_custkey'), nb),
        })

    _H1_EMPTY = pa.table({'o_orderkey': pa.array([], pa.int64()),
                          'o_year': pa.array([], pa.int64()),
                          'obucket': pa.array([], pa.int64())})

    def hop1(group: pa.Table) -> pa.Table:
        is_cust = pc.is_null(group.column('o_orderkey'))
        cust = group.filter(is_cust)
        orders = group.filter(pc.invert(is_cust))
        if cust.num_rows == 0 or orders.num_rows == 0:
            return _H1_EMPTY
        hit = pc.is_in(orders.column('key'), value_set=cust.column('key'))
        orders = orders.filter(hit)
        ok = orders.column('o_orderkey')
        return pa.table({'o_orderkey': ok, 'o_year': orders.column('o_year'),
                         'obucket': _bucket(ok, nb)})

    cust = read_table(sf_dir, 'customer', columns=['c_custkey', 'c_nationkey'])
    orders = read_table(sf_dir, 'orders',
                        columns=['o_orderkey', 'o_custkey', 'o_orderdate'])
    oyears = cust.map_batches(cust_rows, batch_format='pyarrow',
                              zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format='pyarrow',
                           zero_copy_batch=True)
    ).groupby('bucket').map_groups(hop1, batch_format='pyarrow')

    # hop 2: orderkey → (suppkey, o_year, cents)
    def key_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'o_orderkey': batch.column('o_orderkey'),
            'suppkey': pa.nulls(batch.num_rows, pa.int64()),
            'o_year': batch.column('o_year'),
            'rev': pa.nulls(batch.num_rows, pa.int64()),
            'obucket': batch.column('obucket'),
        })

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({'o_orderkey': batch.column('l_orderkey'),
                      'suppkey': batch.column('l_suppkey'),
                      'rev': _rev_cents(batch)})
        g = t.group_by(['o_orderkey', 'suppkey']).aggregate([('rev', 'sum')])
        g = g.rename_columns(['o_orderkey', 'suppkey', 'rev'])
        return pa.table({
            'o_orderkey': g.column('o_orderkey'),
            'suppkey': g.column('suppkey'),
            'o_year': pa.nulls(g.num_rows, pa.int64()),
            'rev': g.column('rev'),
            'obucket': _bucket(g.column('o_orderkey'), nb),
        })

    _H2_EMPTY = pa.table({'suppkey': pa.array([], pa.int64()),
                          'o_year': pa.array([], pa.int64()),
                          'rev': pa.array([], pa.int64()),
                          'sbucket': pa.array([], pa.int64())})

    def hop2(group: pa.Table) -> pa.Table:
        is_key = pc.is_null(group.column('rev'))
        keys = group.filter(is_key)
        li = group.filter(pc.invert(is_key))
        if keys.num_rows == 0 or li.num_rows == 0:
            return _H2_EMPTY
        pos = pc.index_in(li.column('o_orderkey'),
                          value_set=keys.column('o_orderkey'))
        hit = pc.is_valid(pos)
        li, pos = li.filter(hit), pos.filter(hit)
        t = pa.table({'suppkey': li.column('suppkey'),
                      'o_year': pc.take(keys.column('o_year'), pos),
                      'rev': li.column('rev')})
        g = t.group_by(['suppkey', 'o_year']).aggregate([('rev', 'sum')])
        g = g.rename_columns(['suppkey', 'o_year', 'rev'])
        return g.append_column('sbucket', _bucket(g.column('suppkey'), nb))

    li = read_table(sf_dir, 'lineitem',
                    columns=['l_orderkey', 'l_suppkey', 'l_extendedprice',
                             'l_discount'])
    h2 = oyears.map_batches(key_rows, batch_format='pyarrow',
                            zero_copy_batch=True).union(
        li.map_batches(li_partial, batch_format='pyarrow',
                       zero_copy_batch=True)
    ).groupby('obucket').map_groups(hop2, batch_format='pyarrow')

    # hop 3: suppkey → (nationkey, o_year, cents)
    def supp_rows(batch: pa.Table) -> pa.Table:
        sk = batch.column('s_suppkey')
        return pa.table({
            'suppkey': sk,
            'snat': pc.cast(batch.column('s_nationkey'), pa.int64()),
            'o_year': pa.nulls(len(sk), pa.int64()),
            'rev': pa.nulls(len(sk), pa.int64()),
            'sbucket': _bucket(sk, nb),
        })

    def mid_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            'suppkey': batch.column('suppkey'),
            'snat': pa.nulls(batch.num_rows, pa.int64()),
            'o_year': batch.column('o_year'),
            'rev': batch.column('rev'),
            'sbucket': batch.column('sbucket'),
        })

    _H3_EMPTY = pa.table({'o_year': pa.array([], pa.int64()),
                          'nat_rev': pa.array([], pa.int64()),
                          'all_rev': pa.array([], pa.int64())})

    def hop3(group: pa.Table) -> pa.Table:
        is_supp = pc.is_null(group.column('rev'))
        supp = group.filter(is_supp)
        mids = group.filter(pc.invert(is_supp))
        if supp.num_rows == 0 or mids.num_rows == 0:
            return _H3_EMPTY
        pos = pc.index_in(mids.column('suppkey'),
                          value_set=supp.column('suppkey'))
        hit = pc.is_valid(pos)
        mids, pos = mids.filter(hit), pos.filter(hit)
        snat = pc.take(supp.column('snat'), pos)
        is_nat = pc.cast(pc.equal(snat, pa.scalar(nat_key, pa.int64())),
                         pa.int64())
        t = pa.table({'o_year': mids.column('o_year'),
                      'nat_rev': pc.multiply(is_nat, mids.column('rev')),
                      'all_rev': mids.column('rev')})
        g = t.group_by('o_year').aggregate([('nat_rev', 'sum'),
                                            ('all_rev', 'sum')])
        return g.rename_columns(['o_year', 'nat_rev', 'all_rev'])

    supp = read_table(sf_dir, 'supplier', columns=['s_suppkey', 's_nationkey'])
    per_year = supp.map_batches(supp_rows, batch_format='pyarrow',
                                zero_copy_batch=True).union(
        h2.map_batches(mid_rows, batch_format='pyarrow', zero_copy_batch=True)
    ).groupby('sbucket').map_groups(hop3, batch_format='pyarrow')

    def final(group: pa.Table) -> pa.Table:
        yr = group.column('o_year')[0].as_py()
        nat = pc.sum(group.column('nat_rev')).as_py() or 0
        alle = pc.sum(group.column('all_rev')).as_py() or 0
        share = float(nat) / alle if alle else 0.0
        return pa.table({
            'o_year': pa.array([yr], pa.int64()),
            'mkt_share': pa.array(round_half_up([share], 6), pa.float64()),
        })

    return (per_year.groupby('o_year')
            .map_groups(final, batch_format='pyarrow').sort('o_year'))


def q13_order_count_distribution(sf_dir, num_buckets=64):
    """TPC-H Q13 analogue: the distribution of per-customer order counts,
    INCLUDING zero-order customers (the left-join wrinkle: customer keys
    ride the same custkey-bucketed exchange as the per-(block, custkey)
    order-count combiners, so absent customers fold to 0 in-bucket)."""
    nb = num_buckets

    def order_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({'custkey': batch.column('o_custkey')}) \
            .group_by('custkey').aggregate([([], 'count_all')])
        g = g.rename_columns(['custkey', 'n'])
        return pa.table({
            'custkey': g.column('custkey'),
            'n': pc.cast(g.column('n'), pa.int64()),
            'is_cust': pa.array(np.zeros(g.num_rows, np.bool_)),
            'cbucket': _bucket(g.column('custkey'), nb),
        })

    def cust_rows(batch: pa.Table) -> pa.Table:
        ck = batch.column('c_custkey')
        return pa.table({
            'custkey': ck,
            'n': pa.array(np.zeros(len(ck), np.int64)),
            'is_cust': pa.array(np.ones(len(ck), np.bool_)),
            'cbucket': _bucket(ck, nb),
        })

    def bucket_fold(group: pa.Table) -> pa.Table:
        cust = group.filter(group.column('is_cust'))
        if cust.num_rows == 0:
            return pa.table({'c_count': pa.array([], pa.int64()),
                             'custdist': pa.array([], pa.int64())})
        # orders of non-customer keys (FK orphans) are excluded, matching
        # the oracle's LEFT JOIN from customer
        counts = group.group_by('custkey').aggregate([('n', 'sum')])
        counts = counts.rename_columns(['custkey', 'c_count'])
        counts = counts.filter(pc.is_in(counts.column('custkey'),
                                        value_set=cust.column('custkey')))
        g = counts.group_by('c_count').aggregate([([], 'count_all')])
        g = g.rename_columns(['c_count', 'custdist'])
        return pa.table({'c_count': g.column('c_count'),
                         'custdist': pc.cast(g.column('custdist'),
                                             pa.int64())})

    orders = read_table(sf_dir, 'orders', columns=['o_custkey'])
    cust = read_table(sf_dir, 'customer', columns=['c_custkey'])
    per_bucket = orders.map_batches(order_partial, batch_format='pyarrow',
                                    zero_copy_batch=True).union(
        cust.map_batches(cust_rows, batch_format='pyarrow',
                         zero_copy_batch=True)
    ).groupby('cbucket').map_groups(bucket_fold, batch_format='pyarrow')

    def final(group: pa.Table) -> pa.Table:
        return pa.table({
            'c_count': group.column('c_count').slice(0, 1),
            'custdist': pa.array(
                [pc.sum(group.column('custdist')).as_py() or 0], pa.int64()),
        })

    return (per_bucket.groupby('c_count')
            .map_groups(final, batch_format='pyarrow')
            .sort(['custdist', 'c_count'], descending=[True, True]))


def q15_top_supplier(sf_dir, date_from='1996-01-01', date_to='1996-04-01',
                     num_buckets=64):
    """TPC-H Q15 analogue: the supplier(s) with MAX revenue in a quarter
    (ties all returned, exactly — revenue is integer cents so cross-engine
    max-equality is bit-safe).  Per-supplier totals resolve in one
    suppkey-bucketed co-partition (name attached in-bucket); the totals
    dataset is supplier-cardinality (≈10M rows at 100 TB — bounded by
    schema, safe to materialize) and is scanned twice: once for the global
    max (a tiny aggregate), once for the equality filter."""
    nb = num_buckets
    lo, hi = _ts(date_from), _ts(date_to)

    def li_partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch.column('l_shipdate'), lo),
                    pc.less(batch.column('l_shipdate'), hi))
        t = batch.filter(m)
        g = pa.table({'suppkey': t.column('l_suppkey'),
                      'rev': _rev_cents(t)}) \
            .group_by('suppkey').aggregate([('rev', 'sum')])
        g = g.rename_columns(['suppkey', 'rev'])
        return pa.table({
            'suppkey': g.column('suppkey'),
            's_name': pa.nulls(g.num_rows, pa.string()),
            'rev': g.column('rev'),
            'sbucket': _bucket(g.column('suppkey'), nb),
        })

    def supp_rows(batch: pa.Table) -> pa.Table:
        sk = batch.column('s_suppkey')
        return pa.table({
            'suppkey': sk,
            's_name': batch.column('s_name'),
            'rev': pa.nulls(len(sk), pa.int64()),
            'sbucket': _bucket(sk, nb),
        })

    _EMPTY = pa.table({'s_suppkey': pa.array([], pa.int64()),
                       's_name': pa.array([], pa.string()),
                       'total_cents': pa.array([], pa.int64())})

    def bucket_fold(group: pa.Table) -> pa.Table:
        is_supp = pc.is_valid(group.column('s_name'))
        supp = group.filter(is_supp)
        li = group.filter(pc.invert(is_supp))
        if supp.num_rows == 0 or li.num_rows == 0:
            return _EMPTY
        g = li.select(['suppkey', 'rev']).group_by('suppkey').aggregate(
            [('rev', 'sum')]).rename_columns(['suppkey', 'total_cents'])
        pos = pc.index_in(g.column('suppkey'), value_set=supp.column('suppkey'))
        hit = pc.is_valid(pos)
        g, pos = g.filter(hit), pos.filter(hit)
        return pa.table({'s_suppkey': g.column('suppkey'),
                         's_name': pc.take(supp.column('s_name'), pos),
                         'total_cents': g.column('total_cents')})

    li = read_table(sf_dir, 'lineitem',
                    columns=['l_suppkey', 'l_shipdate', 'l_extendedprice',
                             'l_discount'])
    supp = read_table(sf_dir, 'supplier', columns=['s_suppkey', 's_name'])
    totals = li.map_batches(li_partial, batch_format='pyarrow',
                            zero_copy_batch=True).union(
        supp.map_batches(supp_rows, batch_format='pyarrow',
                         zero_copy_batch=True)
    ).groupby('sbucket').map_groups(bucket_fold, batch_format='pyarrow') \
        .materialize()   # supplier-cardinality by construction (see docstring)
    # empty window → the rev CTE is empty → SQL's WHERE x = NULL matches
    # nothing; mirror that with an explicit empty result
    if totals.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table({
            's_suppkey': pa.array([], pa.int64()),
            's_name': pa.array([], pa.string()),
            'total_revenue': pa.array([], pa.float64())}))
    gmax = totals.max('total_cents')

    def winners(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column('total_cents'),
                                  pa.scalar(gmax, pa.int64())))
        return pa.table({
            's_suppkey': t.column('s_suppkey'),
            's_name': t.column('s_name'),
            'total_revenue': pa.array(
                t.column('total_cents').to_numpy(zero_copy_only=False)
                / 100.0, pa.float64()),
        })

    return totals.map_batches(winners, batch_format='pyarrow',
                              zero_copy_batch=True).sort('s_suppkey')


def q19_discounted_revenue(sf_dir, num_buckets=64):
    """TPC-H Q19 analogue: revenue from an OR-of-conjunctions predicate
    spanning both part attributes (brand, size) and lineitem attributes
    (quantity) — the row-level-joint-predicate shape: slim (partkey, qty,
    cents) rows cross the partkey exchange once, pre-pruned map-side to
    the quantity envelope (1..30) so out-of-range rows never ship."""
    nb = num_buckets
    clauses = [('Brand#1', 1.0, 11.0, 1, 5),
               ('Brand#2', 10.0, 20.0, 1, 10),
               ('Brand#3', 20.0, 30.0, 1, 15)]
    qty_lo = min(c[1] for c in clauses)
    qty_hi = max(c[2] for c in clauses)
    brands = sorted({c[0] for c in clauses})

    def part_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column('p_brand'),
                                  value_set=pa.array(brands, pa.string())))
        pk = t.column('p_partkey')
        return pa.table({
            'partkey': pk,
            'brand': t.column('p_brand'),
            'size': pc.cast(t.column('p_size'), pa.int64()),
            'qty': pa.nulls(t.num_rows, pa.float64()),
            'rev': pa.nulls(t.num_rows, pa.int64()),
            'pbucket': _bucket(pk, nb),
        })

    def li_rows(batch: pa.Table) -> pa.Table:
        q = batch.column('l_quantity')
        m = pc.and_(pc.greater_equal(q, pa.scalar(qty_lo)),
                    pc.less_equal(q, pa.scalar(qty_hi)))
        t = batch.filter(m)
        return pa.table({
            'partkey': t.column('l_partkey'),
            'brand': pa.nulls(t.num_rows, pa.string()),
            'size': pa.nulls(t.num_rows, pa.int64()),
            'qty': t.column('l_quantity'),
            'rev': _rev_cents(t),
            'pbucket': _bucket(t.column('l_partkey'), nb),
        })

    def bucket_fold(group: pa.Table) -> pa.Table:
        is_part = pc.is_valid(group.column('brand'))
        parts = group.filter(is_part)
        li = group.filter(pc.invert(is_part))
        empty = pa.table({'k': pa.array([], pa.int64()),
                          'rev': pa.array([], pa.int64()),
                          'n': pa.array([], pa.int64())})
        if parts.num_rows == 0 or li.num_rows == 0:
            return empty
        pos = pc.index_in(li.column('partkey'),
                          value_set=parts.column('partkey'))
        hit = pc.is_valid(pos)
        li, pos = li.filter(hit), pos.filter(hit)
        brand = pc.take(parts.column('brand'), pos)
        size = pc.take(parts.column('size'), pos)
        qty = li.column('qty')
        keep = None
        for (b, ql, qh, sl, sh) in clauses:
            m = pc.and_(pc.and_(pc.equal(brand, b),
                                pc.and_(pc.greater_equal(qty, pa.scalar(ql)),
                                        pc.less_equal(qty, pa.scalar(qh)))),
                        pc.and_(pc.greater_equal(size, pa.scalar(sl,
                                                                 pa.int64())),
                                pc.less_equal(size, pa.scalar(sh,
                                                              pa.int64()))))
            keep = m if keep is None else pc.or_(keep, m)
        t = li.filter(keep)
        if t.num_rows == 0:
            return empty
        return pa.table({
            'k': pa.array([0], pa.int64()),
            'rev': pa.array([pc.sum(t.column('rev')).as_py() or 0],
                            pa.int64()),
            'n': pa.array([t.num_rows], pa.int64()),
        })

    part = read_table(sf_dir, 'part', columns=['p_partkey', 'p_brand',
                                               'p_size'])
    li = read_table(sf_dir, 'lineitem',
                    columns=['l_partkey', 'l_quantity', 'l_extendedprice',
                             'l_discount'])
    per_bucket = part.map_batches(part_rows, batch_format='pyarrow',
                                  zero_copy_batch=True).union(
        li.map_batches(li_rows, batch_format='pyarrow', zero_copy_batch=True)
    ).groupby('pbucket').map_groups(bucket_fold, batch_format='pyarrow')

    def final(group: pa.Table) -> pa.Table:
        rev = pc.sum(group.column('rev')).as_py() or 0
        n = pc.sum(group.column('n')).as_py() or 0
        return pa.table({
            'revenue': pa.array([rev / 100.0], pa.float64()),
            'n_items': pa.array([n], pa.int64()),
        })

    return per_bucket.union(_seed_row(k=0, rev=0, n=0)) \
        .groupby('k').map_groups(final, batch_format='pyarrow')


def q22_global_sales_opportunity(sf_dir, cutoff='2000-01-01',
                                 num_buckets=64):
    """TPC-H Q22 analogue: customers with above-average positive balances
    and NO orders since ``cutoff`` (dormant high-balance accounts; the
    pure no-orders-ever variant is vacuous on this schema's synthetic
    data, where every customer orders).  The global threshold is resolved
    as an exact INTEGER cross-multiplication (cents·count > total_cents —
    no division, so the boundary can't round differently across engines);
    the anti-join resolves in-bucket on the custkey exchange, with the
    order side pre-filtered map-side to the cutoff window."""
    nb = num_buckets
    cut = _ts(cutoff)
    _, names = _region_nationkeys(sf_dir, 'ASIA')

    # pass A: global (sum_cents, count) over positive balances — one
    # combiner row per block, tiny constant-key fold
    def bal_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column('c_acctbal'))
        pos = pc.greater(cents, pa.scalar(0, pa.int64()))
        cents = cents.filter(pos)
        return pa.table({
            'k': pa.array([0], pa.int64()),
            's': pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
            'c': pa.array([len(cents)], pa.int64()),
        })

    def bal_final(group: pa.Table) -> pa.Table:
        return pa.table({
            's': pa.array([pc.sum(group.column('s')).as_py() or 0],
                          pa.int64()),
            'c': pa.array([pc.sum(group.column('c')).as_py() or 0],
                          pa.int64()),
        })

    cust_bal = read_table(sf_dir, 'customer', columns=['c_acctbal'])
    stats = cust_bal.map_batches(bal_partial, batch_format='pyarrow',
                                 zero_copy_batch=True) \
        .groupby('k').map_groups(bal_final, batch_format='pyarrow') \
        .take_all()   # exactly one row by construction
    total_cents, count = stats[0]['s'], stats[0]['c']

    # pass B: candidates (cents·count > total_cents) anti-joined vs orders
    def cand_rows(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column('c_acctbal'))
        keep = pc.greater(pc.multiply(cents, pa.scalar(count, pa.int64())),
                          pa.scalar(total_cents, pa.int64()))
        t = batch.filter(keep)
        cents = cents.filter(keep)
        ck = t.column('c_custkey')
        return pa.table({
            'custkey': ck,
            'nationkey': pc.cast(t.column('c_nationkey'), pa.int64()),
            'cents': cents,
            'cbucket': _bucket(ck, nb),
        })

    def order_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch.column('o_orderdate'), cut))
        ck = t.column('o_custkey')
        return pa.table({
            'custkey': ck,
            'nationkey': pa.nulls(t.num_rows, pa.int64()),
            'cents': pa.nulls(t.num_rows, pa.int64()),
            'cbucket': _bucket(ck, nb),
        })

    _EMPTY = pa.table({'nationkey': pa.array([], pa.int64()),
                       'numcust': pa.array([], pa.int64()),
                       'cents': pa.array([], pa.int64())})

    def bucket_fold(group: pa.Table) -> pa.Table:
        is_cand = pc.is_valid(group.column('cents'))
        cand = group.filter(is_cand)
        ordered = group.filter(pc.invert(is_cand))
        if cand.num_rows == 0:
            return _EMPTY
        no_orders = pc.invert(pc.is_in(cand.column('custkey'),
                                       value_set=ordered.column('custkey')))
        t = cand.filter(no_orders)
        if t.num_rows == 0:
            return _EMPTY
        g = t.select(['nationkey', 'cents']).group_by('nationkey').aggregate(
            [([], 'count_all'), ('cents', 'sum')])
        g = g.rename_columns(['nationkey', 'numcust', 'cents'])
        return pa.table({'nationkey': g.column('nationkey'),
                         'numcust': pc.cast(g.column('numcust'), pa.int64()),
                         'cents': g.column('cents')})

    cust = read_table(sf_dir, 'customer',
                      columns=['c_custkey', 'c_nationkey', 'c_acctbal'])
    orders = read_table(sf_dir, 'orders',
                        columns=['o_custkey', 'o_orderdate'])
    per_nation = cust.map_batches(cand_rows, batch_format='pyarrow',
                                  zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format='pyarrow',
                           zero_copy_batch=True)
    ).groupby('cbucket').map_groups(bucket_fold, batch_format='pyarrow')

    def final(group: pa.Table) -> pa.Table:
        nk = group.column('nationkey')[0].as_py()
        return pa.table({
            'n_name': pa.array([names[nk]], pa.string()),
            'numcust': pa.array(
                [pc.sum(group.column('numcust')).as_py() or 0], pa.int64()),
            'totacctbal': pa.array(
                [(pc.sum(group.column('cents')).as_py() or 0) / 100.0],
                pa.float64()),
        })

    return (per_nation.groupby('nationkey')
            .map_groups(final, batch_format='pyarrow').sort('n_name'))
