package graft

import org.apache.spark.sql.functions._

/** Fourth relational batch: bitwise operators, statistical aggregates,
  * hash functions, and the second string-function family — rounding out
  * the scalar/aggregate function coverage. */
object RelationalQueries4 {
  import Registry.Q

  val all: Seq[Q] = Seq(
    // Bitwise operator family.
    Q("q58_bitwise",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.filter(col("l_orderkey") % 31 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_orderkey").bitwiseAND(col("l_partkey"))).as("k_and"),
            (col("l_orderkey").bitwiseOR(col("l_partkey"))).as("k_or"),
            (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("k_xor"),
            shiftleft(col("l_linenumber"), 2).as("ln_shl"),
            shiftright(col("l_orderkey"), 3).as("k_shr"),
            bit_count(col("l_orderkey")).as("k_bits"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |CAST(l_orderkey & l_partkey AS BIGINT) AS k_and,
             |CAST(l_orderkey | l_partkey AS BIGINT) AS k_or,
             |CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS k_xor,
             |CAST(l_linenumber << 2 AS INT) AS ln_shl,
             |CAST(l_orderkey >> 3 AS BIGINT) AS k_shr,
             |CAST(bit_count(l_orderkey) AS INT) AS k_bits
             |FROM lineitem WHERE l_orderkey % 31 = 0""".stripMargin)),

    // Statistical aggregates: stddev/variance/corr/covar (rounded — these
    // accumulate in floating point, but at 6 decimals on these magnitudes
    // the ~1e-12 relative ordering jitter can't flip a digit).
    Q("q59_stats_agg",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.groupBy(col("l_linestatus"))
          .agg(round(stddev_samp(col("l_quantity")), 6).as("qty_stddev"),
            round(var_samp(col("l_quantity")), 6).as("qty_var"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
            round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("qty_disc_covar"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT l_linestatus,
             |ROUND(stddev_samp(l_quantity), 6) AS qty_stddev,
             |ROUND(var_samp(l_quantity), 6) AS qty_var,
             |ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
             |ROUND(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar,
             |COUNT(*) AS n
             |FROM lineitem GROUP BY l_linestatus""".stripMargin)),

    // Hash function family (cross-engine-stable digests).
    Q("q68_hash_funcs",
      (spark, dir) => {
        val p = Tables.load(spark, dir, "part")
        p.filter(col("p_partkey") % 17 === 0)
          .select(col("p_partkey"),
            md5(to_binary(col("p_name"), lit("utf-8"))).as("name_md5"),
            sha2(col("p_name"), 256).as("name_sha256"))
      },
      // DuckDB 1.0 ships only md5/sha256 (no sha512/sha1); Spark-internal
      // hashes (xxhash64/crc32/murmur) are exercised inside the LSH ops.
      Some("""SELECT p_partkey, md5(p_name) AS name_md5,
             |sha256(p_name) AS name_sha256
             |FROM part WHERE p_partkey % 17 = 0""".stripMargin)),

    // Second string-function family: translate/repeat/reverse/strpos/
    // split_part/left/right.
    Q("q69_string_funcs2",
      (spark, dir) => {
        val p = Tables.load(spark, dir, "part")
        p.filter(col("p_partkey") % 19 === 0)
          .select(col("p_partkey"),
            translate(col("p_type"), "AEO", "aeo").as("type_translated"),
            repeat(col("p_brand"), 2).as("brand_twice"),
            reverse(col("p_name")).as("name_rev"),
            instr(col("p_name"), "a").as("first_a"),
            split_part(col("p_brand"), lit("#"), lit(2)).as("brand_id"),
            levenshtein(col("p_type"), lit("STANDARD")).as("type_dist"),
            substring(col("p_name"), 1, 3).as("name_left"),
            col("p_name").substr(length(col("p_name")) - 2, lit(3)).as("name_right"))
      },
      Some("""SELECT p_partkey,
             |translate(p_type, 'AEO', 'aeo') AS type_translated,
             |repeat(p_brand, 2) AS brand_twice,
             |reverse(p_name) AS name_rev,
             |CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
             |split_part(p_brand, '#', 2) AS brand_id,
             |CAST(levenshtein(p_type, 'STANDARD') AS INT) AS type_dist,
             |left(p_name, 3) AS name_left,
             |right(p_name, 3) AS name_right
             |FROM part WHERE p_partkey % 19 = 0""".stripMargin)),
  )
}
