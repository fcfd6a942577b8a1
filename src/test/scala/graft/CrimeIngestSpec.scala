package graft

import java.nio.file.{Files, Path}
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CrimeIngest

/** End-to-end pipeline parity test (SURVEY.md §5 item 4): ingest →
  * process → latest-pointer repoint, asserting catalog state, the
  * non-padded partition layout, and the reference's string-boolean +
  * count(col) semantics (FIXTURES.md §1.1 fixture requirements). */
class CrimeIngestSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def writeFixtureCsv(dir: Path): String = {
    val header = "id,case_number,date_value,block_value,iucr,primary_type," +
      "description_value,local_description,arrest,domestic,beat,district," +
      "ward,community_area,fbi_code,x_coordinate,y_coordinate,year," +
      "updated_on,latitude,longitude,location"
    // rows pin: arrest 'True'/'False' (case-sensitive), a lowercase
    // 'false' that must NOT match, a NULL primary_type (count(col)
    // semantics), NULL coords.
    val rows = Seq(
      """1,HY001,"3/7/2024 1:02:03 PM",100 MAIN ST,0110,THEFT,OVER $500,STREET,False,False,111,1,5,10,06,1100,1900,2024,"3/7/2024 1:02:03 PM",41.880000000,-87.630000000,"(41.88, -87.63)"""",
      """2,HY002,"3/7/2024 2:02:03 PM",200 OAK AVE,0120,THEFT,UNDER $500,ALLEY,False,True,112,1,6,11,06,,,2024,"3/7/2024 2:02:03 PM",,,""",
      """3,HY003,"3/7/2024 3:02:03 PM",300 ELM RD,0130,BATTERY,SIMPLE,HOME,True,False,113,2,7,12,08B,1200,1800,2024,"3/7/2024 3:02:03 PM",41.870000000,-87.620000000,"(41.87, -87.62)"""",
      """4,HY004,"3/7/2024 4:02:03 PM",400 PINE LN,0140,,UNKNOWN,PARK,False,False,114,2,8,13,26,1300,1700,2024,"3/7/2024 4:02:03 PM",41.860000000,-87.610000000,"(41.86, -87.61)"""",
      """5,HY005,"3/7/2024 5:02:03 PM",500 LAKE DR,0150,ASSAULT,AGGRAVATED,BAR,false,False,115,3,9,14,04A,1400,1600,2024,"3/7/2024 5:02:03 PM",41.850000000,-87.600000000,"(41.85, -87.6)"""")
    val f = dir.resolve("rows.csv")
    Files.writeString(f, (header +: rows).mkString("\n"))
    f.toString
  }

  test("ingest → process → latest pointer, with reference semantics") {
    val tmp = Files.createTempDirectory("crime-e2e")
    val csv = writeFixtureCsv(tmp)
    val wh = tmp.resolve("warehouse").toString
    val db = "crime_data_test"
    val day1 = LocalDate.of(2024, 3, 7)

    // stage 1: ingest
    val stamped = CrimeIngest.ingest(spark, csv, db, wh, day1)
    assert(stamped.count() == 5)
    // non-padded partition dirs: y=2024/m=3/d=7 (not m=03)
    assert(Files.isDirectory(
      java.nio.file.Paths.get(s"$wh/crimes_2001_to_present/y=2024/m=3/d=7")))
    assert(!Files.exists(
      java.nio.file.Paths.get(s"$wh/crimes_2001_to_present/y=2024/m=03")))

    // stage 2: process (flagship semantics)
    val agg = CrimeIngest.process(spark, db, wh, day1)
    val byType = agg.collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // arrest='False' matches rows 1,2,4 (NOT row 3 'True', NOT row 5
    // lowercase 'false'); count(primary_type) skips row 4's NULL.
    assert(byType == Map(Some("THEFT") -> 2L, None -> 0L))

    // latest pointers exist and resolve
    assert(spark.catalog.tableExists(s"$db.crimes_2001_to_present_latest"))
    assert(spark.table(s"$db.crimes_2001_to_present_latest").count() == 5)

    // day 2: re-ingest repoints (ALTER TABLE branch)
    val day2 = LocalDate.of(2024, 3, 8)
    CrimeIngest.ingest(spark, csv, db, wh, day2)
    assert(Files.isDirectory(
      java.nio.file.Paths.get(s"$wh/crimes_2001_to_present/y=2024/m=3/d=8")))
    assert(spark.table(s"$db.crimes_2001_to_present_latest").count() == 5)

    // typed timestamp parse (the improvement over the reference)
    val parsed = CrimeIngest.withParsedDate(CrimeIngest.readCrimeCsv(spark, csv))
      .select("event_ts").collect()
    assert(parsed.forall(!_.isNullAt(0)))

    // typed boolean casts: canonical 'True'/'False' map, the row-5
    // lowercase 'false' is NULL (matches the case-sensitive filter
    // contract), never a silent true/false guess
    val flags = CrimeIngest.withTypedFlags(CrimeIngest.readCrimeCsv(spark, csv))
      .select("id", "arrest_bool").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .toMap
    assert(flags == Map(1 -> Some(false), 2 -> Some(false),
      3 -> Some(true), 4 -> Some(false), 5 -> None))

    // partition pruning: a y/m/d predicate must reach the scan as a
    // PartitionFilter (SURVEY §4 — predicate-addressable partitions),
    // so day-2 consumers read one directory, not the whole table.
    val pruned = spark.table(s"$db.crimes_2001_to_present")
      .filter(org.apache.spark.sql.functions.col("d") === "8")
    val scanPlan = pruned.queryExecution.executedPlan.toString
    assert(scanPlan.contains("PartitionFilters: [isnotnull(d"),
      s"expected partition filter in scan:\n$scanPlan")
    assert(pruned.count() == 5)
  }

  test("partitioned JDBC extract via embedded Derby (reference's primary source)") {
    // The reference extracts over ONE JDBC connection
    // (spark_ingest_script.py:56-61); readJdbcPartitioned is the
    // scale-correct form. Exercised for real here against embedded
    // Derby (ships with Spark's jars) — numPartitions range slices,
    // one connection each.
    val tmp = Files.createTempDirectory("crime-jdbc")
    System.setProperty("derby.system.home", tmp.toString)
    val url = s"jdbc:derby:$tmp/crimedb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE crimes (
          |  id INT NOT NULL PRIMARY KEY,
          |  case_number VARCHAR(16) NOT NULL,
          |  primary_type VARCHAR(32),
          |  arrest VARCHAR(8),
          |  domestic VARCHAR(8))""".stripMargin)
      val ins = conn.prepareStatement("INSERT INTO crimes VALUES (?, ?, ?, ?, ?)")
      val rows = Seq(
        (1, "HY001", "THEFT", "False", "False"),
        (2, "HY002", "THEFT", "False", "True"),
        (3, "HY003", "BATTERY", "True", "False"),
        (4, "HY004", null, "False", "False"),
        (5, "HY005", "ASSAULT", "false", "False"))
      rows.foreach { case (id, cn, pt, ar, dom) =>
        ins.setInt(1, id); ins.setString(2, cn); ins.setString(3, pt)
        ins.setString(4, ar); ins.setString(5, dom)
        ins.executeUpdate()
      }
    } finally conn.close()

    val df = CrimeIngest.readJdbcPartitioned(spark, url, "crimes",
      partitionColumn = "id", lowerBound = 1L, upperBound = 6L,
      numPartitions = 3, user = "app", password = "")
    // genuinely partitioned: three range-slice scan tasks
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 5)
    // predicate pushdown reaches the JDBC scan (ships as WHERE to the
    // database, same as the parquet PushedFilters contract)
    val jdbcPlan = df.filter(org.apache.spark.sql.functions.col("id") > 2)
      .queryExecution.executedPlan.toString
    assert(jdbcPlan.contains("PushedFilters") && jdbcPlan.contains("GreaterThan(ID,2)"),
      s"expected pushed JDBC filter in plan:\n$jdbcPlan")
    // reference flagship semantics hold over the JDBC source too:
    // case-sensitive string match, count(col) null skipping
    import org.apache.spark.sql.functions._
    val byType = df.filter(col("arrest") === "False")
      .groupBy(col("primary_type"))
      .agg(count(col("primary_type")).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byType == Map(Some("THEFT") -> 2L, None -> 0L))
  }

  test("malformed CSV rows: PERMISSIVE nulls vs FAILFAST abort") {
    // The reference's LOAD DATA silently coerces bad rows; Spark makes
    // the policy explicit. Default (PERMISSIVE) keeps the row with
    // nulls for unparsable fields; FAILFAST turns ingest into a hard
    // gate — both are one option away from readCrimeCsv's schema'd read.
    val tmp = Files.createTempDirectory("crime-badcsv")
    val header = "id,case_number,date_value,block_value,iucr,primary_type," +
      "description_value,local_description,arrest,domestic,beat,district," +
      "ward,community_area,fbi_code,x_coordinate,y_coordinate,year," +
      "updated_on,latitude,longitude,location"
    val good = """1,HY001,"3/7/2024 1:02:03 PM",100 MAIN ST,0110,THEFT,OVER $500,STREET,False,False,111,1,5,10,06,1100,1900,2024,"3/7/2024 1:02:03 PM",41.88,-87.63,"(41.88, -87.63)""""
    val badInt = """NOT_AN_INT,HY002,"3/7/2024 2:02:03 PM",200 OAK AVE,0120,THEFT,UNDER $500,ALLEY,False,True,112,1,6,11,06,1100,1900,2024,"3/7/2024 2:02:03 PM",41.88,-87.63,"x""""
    val f = tmp.resolve("bad.csv")
    Files.writeString(f, Seq(header, good, badInt).mkString("\n"))

    val permissive = CrimeIngest.readCrimeCsv(spark, f.toString).collect()
    assert(permissive.length == 2)
    assert(permissive.count(_.isNullAt(0)) == 1) // bad id → null, row kept

    val failfast = spark.read
      .option("header", "true").option("quote", "\"").option("mode", "FAILFAST")
      .schema(CrimeIngest.crimeSchema).csv(f.toString)
    intercept[org.apache.spark.SparkException](failfast.collect())
  }

  test("count(col) vs count(*) null semantics (property)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Some("A"), None, Some("B"), None, Some("A")).toDF("k")
    val r = df.agg(count(col("k")).as("c_col"), count(lit(1)).as("c_star"))
      .collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 5)
  }
}
