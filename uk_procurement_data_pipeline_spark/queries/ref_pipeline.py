"""The reference pipeline's flagship transform: wide flatten of a nested
OCDS-shaped release (P2, ref 2a_extract_contracts_finder.py:257-643).

The reference spends ~390 LoC of imperative loops turning one nested OCDS
release into a ~110-column flat row. The Spark-first translation is: build
the nested document as real nested columns, then ONE wide ``select`` of
dot-paths and higher-order functions — the whole flatten is a single
Catalyst Project (one whole-stage-codegen span, zero Python, zero extra
shuffle beyond the document build itself).

``ocds_flatten_wide`` rebuilds the reference's record shape from the
driver's star schema (order = release, customer = buyer, lineitems =
items/supplier parties) and flattens it with the exact operator set the
reference uses: buyer first-match by id (2a:82-91), supplier role filter
(2a:94-101), pipe_join folds (2a:147-150), two-level flatten (2a:360-367),
first-element plucks (2a:75-79).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.catalog import load, spread
from uk_procurement_data_pipeline_spark.queries.base import register

# The wide-select fragments, shared between engines via parallel SQL below.
_SUPPLIERS = "filter(release.parties, p -> array_contains(p.roles, 'supplier'))"
_D_SUPPLIERS = "list_filter(release.parties, p -> list_contains(p.roles, 'supplier'))"


@register(
    name="ocds_flatten_wide",
    survey="P2 J1 J2 J3 F10 F12 F20 F17 F18 F19 F21 A1 A2 A5 O3",
    doc="Flagship wide flatten: nested release struct -> 30 flat columns in "
    "one Project (the Spark form of ref 2a:257-643). Exercises keyed "
    "first-match, role filter, document-type first-match, code->category "
    "mapping, month names, pipe_join folds, head/rest CPV split, two-level "
    "address flatten, head plucks.",
    oracle="""
        WITH li_g AS (
            SELECT l_orderkey,
                   list(struct_pack(item_id := l_linenumber, part := l_partkey,
                                    qty := l_quantity,
                                    cls := struct_pack(
                                        scheme := 'CPV',
                                        id := CAST(45000000 + l_partkey % 100000
                                                   AS VARCHAR)),
                                    addrs := [struct_pack(
                                        postalCode := 'PC' || CAST(l_linenumber AS VARCHAR),
                                        region := CASE l_linenumber % 3
                                                  WHEN 0 THEN 'London'
                                                  WHEN 1 THEN 'Wales'
                                                  ELSE 'Scotland' END)])
                        ORDER BY l_linenumber, l_partkey, l_quantity) AS items,
                   list_transform(
                       list_sort(list_distinct(list(l_suppkey))),
                       sid -> struct_pack(
                           id := sid,
                           name := 'Supplier#' || CAST(sid AS VARCHAR),
                           roles := ['supplier', 'tenderer'])) AS supp_parties
            FROM lineitem GROUP BY l_orderkey),
        rel AS (
            SELECT struct_pack(
                ocid := 'ocds-' || CAST(o_orderkey AS VARCHAR),
                published := o_orderdate,
                buyer := struct_pack(id := o_custkey, name := c_name),
                tender := struct_pack(status := o_orderstatus,
                                      amount := o_totalprice,
                                      currency := 'GBP',
                                      items := items,
                                      documents := [
                                          struct_pack(
                                              doc_id := 'd1-' || CAST(o_orderkey AS VARCHAR),
                                              documentType := 'tenderNotice',
                                              url := 'http://n/' || CAST(o_orderkey AS VARCHAR)),
                                          struct_pack(
                                              doc_id := 'd2-' || CAST(o_orderkey AS VARCHAR),
                                              documentType := 'awardNotice',
                                              url := 'http://a/' || CAST(o_orderkey AS VARCHAR))]),
                parties := list_prepend(
                    struct_pack(id := o_custkey, name := c_name,
                                roles := ['buyer']),
                    supp_parties),
                awards := [struct_pack(award_id := 'award-' || CAST(o_orderkey AS VARCHAR),
                                       amount := o_totalprice,
                                       suppliers := list_transform(supp_parties,
                                                                   s -> s.id))]
                ) AS release
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN li_g ON o_orderkey = l_orderkey)
        SELECT release.ocid AS ocid,
               release.published AS published,
               release.buyer.id AS buyer_id,
               release.buyer.name AS buyer_name,
               release.tender.status AS tender_status,
               release.tender.amount AS tender_amount,
               release.tender.currency AS tender_currency,
               len(release.tender.items) AS n_items,
               release.tender.items[1].part AS first_item_part,
               array_to_string(list_transform(release.tender.items,
                   i -> CAST(i.part AS VARCHAR)), '|') AS items_pipe,
               list_filter(release.parties,
                   p -> p.id = release.buyer.id)[1].name AS buyer_party_name,
               len({D_SUPPLIERS}) AS n_supplier_parties,
               array_to_string(list_sort(list_distinct(list_transform(
                   {D_SUPPLIERS}, p -> CAST(p.id AS VARCHAR)))), ';')
                   AS supplier_ids,
               array_to_string(list_sort(list_distinct(flatten(list_transform(
                   {D_SUPPLIERS}, p -> p.roles)))), ';') AS all_supplier_roles,
               len(release.awards) AS n_awards,
               release.awards[1].award_id AS first_award_id,
               len(flatten(list_transform(release.awards, a -> a.suppliers)))
                   AS n_award_supplier_refs,
               list_sum(list_transform(release.awards, a -> a.amount))
                   AS awards_total,
               list_filter(release.tender.documents,
                   d -> d.documentType = 'tenderNotice')[1].url
                   AS tender_notice_url,
               list_filter(release.tender.documents,
                   d -> d.documentType = 'awardNotice')[1].url
                   AS award_notice_url,
               len(release.tender.documents) AS n_documents,
               CASE release.tender.status WHEN 'O' THEN 'OPEN'
                    WHEN 'F' THEN 'FULFILLED' WHEN 'P' THEN 'PENDING'
                    ELSE 'OTHER' END AS status_category,
               monthname(release.published) AS published_month,
               release.tender.items[1].cls.id AS main_cpv,
               COALESCE(array_to_string(list_transform(
                   release.tender.items[2:],
                   i -> i.cls.id), ';'), '') AS additional_cpvs,
               array_to_string(list_sort(list_distinct(list_transform(
                   flatten(list_transform(release.tender.items, i -> i.addrs)),
                   ad -> ad.postalCode))), ';') AS delivery_postcodes,
               array_to_string(list_sort(list_distinct(list_transform(
                   flatten(list_transform(release.tender.items, i -> i.addrs)),
                   ad -> ad.region))), ';') AS delivery_regions,
               array_to_string(list_transform(release.tender.items,
                   i -> CAST(CAST(i.qty AS BIGINT) AS VARCHAR)), '|') AS qty_pipe,
               CAST(list_sum(list_transform(release.tender.items,
                   i -> CAST(i.qty AS BIGINT))) AS BIGINT) AS total_qty
        FROM rel
    """.replace("{D_SUPPLIERS}", _D_SUPPLIERS),
)
def ocds_flatten_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the fixture lineitem is one row group; distribute it so the
    # partial collect_list aggregation runs on all cores
    li = spread(load(spark, sf_dir, "lineitem"))
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")

    li_g = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("item_id"),
                    F.col("l_partkey").alias("part"),
                    F.col("l_quantity").alias("qty"),
                    F.expr(
                        """struct('CPV' AS scheme,
                           CAST(45000000 + l_partkey % 100000 AS STRING) AS id)"""
                    ).alias("cls"),
                    F.expr(
                        """array(struct(
                               concat('PC', CAST(l_linenumber AS STRING)) AS postalCode,
                               CASE l_linenumber % 3 WHEN 0 THEN 'London'
                                    WHEN 1 THEN 'Wales' ELSE 'Scotland' END
                                   AS region))"""
                    ).alias("addrs"),
                )
            )
        ).alias("items"),
        F.expr(
            """transform(array_sort(collect_set(l_suppkey)),
                   sid -> struct(sid AS id,
                                 concat('Supplier#', CAST(sid AS STRING)) AS name,
                                 array('supplier', 'tenderer') AS roles))"""
        ).alias("supp_parties"),
    )

    rel = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(li_g, orders.o_orderkey == li_g.l_orderkey)
        .select(
            F.struct(
                F.concat(F.lit("ocds-"), F.col("o_orderkey").cast("string")).alias("ocid"),
                F.col("o_orderdate").alias("published"),
                F.struct(
                    F.col("o_custkey").alias("id"), F.col("c_name").alias("name")
                ).alias("buyer"),
                F.struct(
                    F.col("o_orderstatus").alias("status"),
                    F.col("o_totalprice").alias("amount"),
                    F.lit("GBP").alias("currency"),
                    F.col("items"),
                    F.expr(
                        """array(
                           struct(concat('d1-', CAST(o_orderkey AS STRING)) AS doc_id,
                                  'tenderNotice' AS documentType,
                                  concat('http://n/', CAST(o_orderkey AS STRING)) AS url),
                           struct(concat('d2-', CAST(o_orderkey AS STRING)) AS doc_id,
                                  'awardNotice' AS documentType,
                                  concat('http://a/', CAST(o_orderkey AS STRING)) AS url))"""
                    ).alias("documents"),
                ).alias("tender"),
                F.expr(
                    """array_prepend(
                           transform(supp_parties, s -> struct(s.id AS id,
                                                               s.name AS name,
                                                               s.roles AS roles)),
                           struct(o_custkey AS id, c_name AS name,
                                  array('buyer') AS roles))"""
                ).alias("parties"),
                F.expr(
                    """array(struct(
                           concat('award-', CAST(o_orderkey AS STRING)) AS award_id,
                           o_totalprice AS amount,
                           transform(supp_parties, s -> s.id) AS suppliers))"""
                ).alias("awards"),
            ).alias("release")
        )
    )

    return rel.selectExpr(
        "release.ocid AS ocid",
        "release.published AS published",
        "release.buyer.id AS buyer_id",
        "release.buyer.name AS buyer_name",
        "release.tender.status AS tender_status",
        "release.tender.amount AS tender_amount",
        "release.tender.currency AS tender_currency",
        "size(release.tender.items) AS n_items",
        "element_at(release.tender.items, 1).part AS first_item_part",
        """array_join(transform(release.tender.items,
            i -> CAST(i.part AS STRING)), '|') AS items_pipe""",
        """element_at(filter(release.parties,
            p -> p.id = release.buyer.id), 1).name AS buyer_party_name""",
        f"size({_SUPPLIERS}) AS n_supplier_parties",
        f"""array_join(array_sort(array_distinct(transform(
            {_SUPPLIERS}, p -> CAST(p.id AS STRING)))), ';') AS supplier_ids""",
        f"""array_join(array_sort(array_distinct(flatten(transform(
            {_SUPPLIERS}, p -> p.roles)))), ';') AS all_supplier_roles""",
        "size(release.awards) AS n_awards",
        "element_at(release.awards, 1).award_id AS first_award_id",
        """size(flatten(transform(release.awards, a -> a.suppliers)))
            AS n_award_supplier_refs""",
        """aggregate(release.awards, 0D, (acc, a) -> acc + a.amount)
            AS awards_total""",
        # J3 predicate first-match over documents (ref 2a:104-117)
        """element_at(filter(release.tender.documents,
            d -> d.documentType = 'tenderNotice'), 1).url AS tender_notice_url""",
        """element_at(filter(release.tender.documents,
            d -> d.documentType = 'awardNotice'), 1).url AS award_notice_url""",
        "size(release.tender.documents) AS n_documents",
        # F10 code -> category mapping (ref 2b:26-38)
        """CASE release.tender.status WHEN 'O' THEN 'OPEN'
            WHEN 'F' THEN 'FULFILLED' WHEN 'P' THEN 'PENDING'
            ELSE 'OTHER' END AS status_category""",
        "date_format(release.published, 'MMMM') AS published_month",
        # F21 head/rest split: first CPV = main, rest = additional (ref 2b:335-336)
        "element_at(release.tender.items, 1).cls.id AS main_cpv",
        """array_join(transform(slice(release.tender.items, 2,
            greatest(size(release.tender.items) - 1, 0)),
            i -> i.cls.id), ';') AS additional_cpvs""",
        # F20/A2 two-level flatten + distinct-sorted (ref 2a:360-367)
        """array_join(array_sort(array_distinct(transform(
            flatten(transform(release.tender.items, i -> i.addrs)),
            ad -> ad.postalCode))), ';') AS delivery_postcodes""",
        """array_join(array_sort(array_distinct(transform(
            flatten(transform(release.tender.items, i -> i.addrs)),
            ad -> ad.region))), ';') AS delivery_regions""",
        # A1 pipe_join fold (ref 2a:147-150)
        """array_join(transform(release.tender.items,
            i -> CAST(CAST(i.qty AS BIGINT) AS STRING)), '|') AS qty_pipe""",
        """aggregate(release.tender.items, 0L,
            (acc, i) -> acc + CAST(i.qty AS BIGINT)) AS total_qty""",
    )
