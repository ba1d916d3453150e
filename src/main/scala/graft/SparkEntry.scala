package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.analytics.{Queries, OracleSql}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ingest_dedup" -> (Queries.qIngestDedup _),
    "q1_agg" -> (Queries.q1Agg _),
    "q3_join" -> (Queries.q3Join _),
    "q5_region_revenue" -> (Queries.q5RegionRevenue _),
    "q_topk_window" -> (Queries.qTopkWindow _),
    "q_anti_join" -> (Queries.qAntiJoin _),
    "q_asof_join" -> (Queries.qAsofJoin _),
    "q_asof_native" -> (Queries.qAsofNative _),
    "q_asof_tolerance" -> (Queries.qAsofTolerance _),
    "q17_small_quantity" -> (Queries.q17SmallQuantity _),
    "q13_custdist" -> (Queries.q13CustDist _),
    "q4_priority_check" -> (Queries.q4PriorityCheck _),
    "q6_forecast_revenue" -> (Queries.q6ForecastRevenue _),
    "q15_top_supplier" -> (Queries.q15TopSupplier _),
    "q10_returned_items" -> (Queries.q10ReturnedItems _),
    "q12_priority_split" -> (Queries.q12PrioritySplit _),
    "q14_promo_share" -> (Queries.q14PromoShare _),
    "q19_disjunctive" -> (Queries.q19DisjunctiveRevenue _),
    "q18_large_orders" -> ((s: SparkSession, d: String) => Queries.q18LargeOrders(s, d)),
    "q22_idle_customers" -> (Queries.q22IdleCustomers _),
    "q2_min_cost_supplier" -> (Queries.q2MinCostSupplier _),
    "q7_volume_shipping" -> (Queries.q7VolumeShipping _),
    "q8_market_share" -> (Queries.q8MarketShare _),
    "q9_product_profit" -> (Queries.q9ProductProfit _),
    "q11_important_stock" -> (Queries.q11ImportantStock _),
    "q16_supplier_count" -> (Queries.q16SupplierCount _),
    "q20_excess_shippers" -> (Queries.q20ExcessShippers _),
    "q21_waiting_suppliers" -> (Queries.q21WaitingSuppliers _),
    "q_rollup" -> (Queries.qRollup _),
    "q_skyline" -> (Queries.qSkyline _),
    "q_reorder_gap" -> (Queries.qReorderGap _),
    "q_croston" -> (Queries.qCroston _),
    "q_inventory_policy" -> (Queries.qInventoryPolicy _),
    "q_supplier_hhi" -> (Queries.qSupplierHhi _),
    "q_fuzzy_name_join" -> (Queries.qFuzzyNameJoin _),
    "q_customer_deciles" -> (Queries.qCustomerDeciles _),
    "q_profile" -> (Queries.qProfile _),
    "q_monthly_yoy" -> (Queries.qMonthlyYoy _),
    "q_discount_elasticity" -> (Queries.qDiscountElasticity _),
    "q_ship_latency" -> (Queries.qShipLatency _),
    "q_price_index" -> (Queries.qPriceIndex _),
    "q_abc_xyz" -> (Queries.qAbcXyz _),
    "q_revenue_bridge" -> (Queries.qRevenueBridge _),
    "q_order_backlog" -> (Queries.qOrderBacklog _),
    "q_order_reconciliation" -> (Queries.qOrderReconciliation _),
    "q_item_cf" -> (Queries.qItemCf _),
    "q_theil_decomposition" -> (Queries.qTheilDecomposition _),
    "q_k_anonymity" -> (Queries.qKAnonymity _),
    "q_join_skew_audit" -> (Queries.qJoinSkewAudit _),
    "q_ar_aging" -> (Queries.qArAging _),
    "q_recsys_eval" -> (Queries.qRecsysEval _),
    "q_dq_rules" -> (Queries.qDqRules _),
    "q_priority_transitions" -> (Queries.qPriorityTransitions _),
    "q_cf_coverage" -> (Queries.qCfCoverage _),
    "q_metric_drilldown" -> (Queries.qMetricDrilldown _),
    "q_table_checksum" -> (Queries.qTableChecksum _)
  ) ++ graft.tsdb.TsQueries.queries ++ graft.llm.LlmQueries.queries ++
    graft.analytics.EventAnalytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    OracleSql.all ++ graft.tsdb.TsOracle.all ++ graft.llm.LlmOracle.all ++
      graft.analytics.EventOracle.all
}
