package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.RefPipeline

/** Value-exact semantics of the faithful reference pipelines over in-code
  * fixtures reconstructing the CSV contracts (FIXTURES.md §B), including
  * the edge cases §B.4 calls out.
  */
class RefPipelineSpec extends SparkTestBase {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)

  private val lwRows = Seq(
    Row("LIVING WAGE", "2", 2, 1, "KENT", 17.5),
    Row("MINIMUM WAGE", "0", 1, 1, "KENT", 11.0),      // filtered by P1
    Row("LIVING WAGE", "1", 1, 1, "NOWHERE", 20.0),    // no dim match → J1 drop
    Row(null, "3", 2, 2, "KENT", 15.0))                // null wage_level → dropped

  private val dimLoc = {
    val s = StructType(Seq(
      StructField("LOCATION_ID", LongType),
      StructField("COUNTY", StringType)))
    df(s, Row(1L, "KENT COUNTY"), Row(2L, "SUSSEX COUNTY"))
  }

  private val dimDate = {
    val s = StructType(Seq(
      StructField("DATE_ID", LongType),
      StructField("DATE", DateType)))
    df(s, Row(20260812L, Date.valueOf(Query.SnapshotDate)))
  }

  test("living wage: filter, strict cast, county suffix, contract columns") {
    val out = RefPipeline.factLivingWage(RefPipeline.enrich(
      RefPipeline.transformLivingWage(
        df(RefPipeline.livingWageSchema, lwRows: _*)),
      dimLoc, dimDate)).collect()
    assert(out.length == 1, "MINIMUM, unmatched-county and null rows drop")
    val r = out.head
    assert(r.getAs[Int]("NUMBER_OF_CHILDREN") == 2, "F3 string→int")
    assert(r.getAs[Double]("HOURLY_WAGE") == 17.5)
    assert(r.getAs[Long]("LOCATION_ID") == 1L, "J1 surrogate key")
    assert(r.getAs[Long]("SNAPSHOT_DATE_ID") == 20260812L, "J2 surrogate key")
  }

  test("living wage output pins the exact warehouse column set (B.3)") {
    val out = RefPipeline.factLivingWage(RefPipeline.enrich(
      RefPipeline.transformLivingWage(
        df(RefPipeline.livingWageSchema, lwRows: _*)),
      dimLoc, dimDate))
    assert(out.columns.toSeq == Seq("NUMBER_OF_ADULTS", "NUMBER_OF_CHILDREN",
      "NUMBER_OF_WORKING_ADULTS", "HOURLY_WAGE", "SNAPSHOT_DATE_ID",
      "LOCATION_ID"))
  }

  test("expenses: thousands separator stripped then strict double cast") {
    val in = df(RefPipeline.expensesSchema,
      Row("food", "1", 2, 1, "KENT", "1,234.56"),
      Row("housing", "0", 1, 1, "KENT", "987.00"))
    val out = RefPipeline.factAnnualExpense(RefPipeline.enrich(
      RefPipeline.transformExpenses(in), dimLoc, dimDate))
      .orderBy("CATEGORY").collect()
    assert(out.map(_.getAs[Double]("AMOUNT")).toSeq == Seq(1234.56, 987.0))
  }

  test("empty dim_date silently empties every load (J2, app.py:156-164)") {
    val emptyDimDate = dimDate.filter(lit(false))
    val out = RefPipeline.factTypicalSalary(RefPipeline.enrich(
      RefPipeline.transformSalaries(df(RefPipeline.salariesSchema,
        Row("tech", 120000.0, "KENT"))),
      dimLoc, emptyDimDate))
    assert(out.count() == 0)
  }

  test("end-to-end staged pipelines produce enriched rows with both keys") {
    // sf0.01: the sf0.001 supplier slice is too sparse to guarantee a
    // region-1 county among the LIVING-wage rows (all would drop in J1)
    for (name <- Seq("ref_pipeline_living_wage", "ref_pipeline_annual_expense",
        "ref_pipeline_typical_salary")) {
      val out = run(name, SfOracle)
      assert(out.count() > 0, s"$name must survive the staged lake")
      assert(out.filter(col("LOCATION_ID").isNull
        || col("SNAPSHOT_DATE_ID").isNull).count() == 0)
    }
  }

  test("pipelines drop counties outside the dim filter (silent J1 drop)") {
    // the staged dim keeps only region-1 nations; facts cover all nations
    val nations = spark.read.parquet(s"$SfOracle/nation.parquet")
    val inState = nations.filter(col("n_regionkey") === 1).count()
    val locIds = run("ref_pipeline_typical_salary", SfOracle)
      .select("LOCATION_ID").distinct().count()
    assert(locIds <= inState,
      "only in-state counties may appear in the fact output")
  }
}
