package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Esql, GeoOps}

/** Geo-family semantics on literal frames — fixture-independent: the
  * haversine against a surveyed city pair, Web-Mercator tile keys at
  * known anchor points, and the WKT geo_point contract (malformed →
  * NULL, exact coordinate round-trip). */
class GeoOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("haversine matches the surveyed NYC→LA great-circle distance") {
    import s.implicits._
    // (40.7128, -74.0060) → (34.0522, -118.2437): ~3 935.7 km on the
    // mean-radius sphere (ES uses the same GeoUtils constant)
    val d = Seq(1).toDF("x").select(
      GeoOps.haversineMeters(lit(40.7128), lit(-74.0060),
        lit(34.0522), lit(-118.2437)).as("d")).collect()(0).getDouble(0)
    assert(math.abs(d - 3935740.0) < 2000.0, s"got $d")
    // symmetry and zero distance
    val z = Seq(1).toDF("x").select(
      GeoOps.haversineMeters(lit(40.7), lit(-74.0), lit(40.7), lit(-74.0)))
      .collect()(0).getDouble(0)
    assert(z === 0.0)
  }

  test("geotile anchors: the origin sits in tile 6/32/32; poles clamp inside the cap") {
    import s.implicits._
    def tile(lat: Double, lon: Double): (Long, Long) = {
      val r = Seq((lat, lon)).toDF("lat", "lon").select(
        floor(lit(64) * ($"lon" + 180) / 360).as("xt"),
        floor(round(lit(64) * (lit(1.0) -
          log(tan(radians($"lat")) + lit(1.0) / cos(radians($"lat"))) /
            lit(math.Pi)) / 2, 6)).as("yt")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // (0,0) is the SW corner of the center tile at zoom 6 (n=64)
    assert(tile(0.0, 0.0) === ((32L, 32L)))
    // northern latitudes → smaller y (Web-Mercator y grows southward)
    assert(tile(60.0, 0.0)._2 < 32L)
    assert(tile(-60.0, 0.0)._2 > 32L)
    // the synthesized-coordinate extremes stay inside [0, 64) on y —
    // the fixture's ±85 cap IS Web Mercator's usable band
    assert(tile(84.99, 179.97)._2 >= 0L)
    assert(tile(-85.0, -180.0)._2 <= 63L)
  }

  test("geohash anchors: the textbook ezs42 cell, precision nesting, and ST_GEOHASH/ST_GEOTILE agreement") {
    import s.implicits._
    def gh(lon: Double, lat: Double, p: Int): String =
      Seq((lon, lat)).toDF("lon", "lat")
        .select(GeoOps.geohash($"lon", $"lat", p).as("g")).collect()(0).getString(0)
    // the geohash literature's canonical example: (42.605, -5.603) → ezs42
    assert(gh(-5.603, 42.605, 5) === "ezs42")
    // prefix nesting: a higher precision refines, never relocates
    assert(gh(-5.603, 42.605, 3) === "ezs")
    assert(gh(-5.603, 42.605, 9).startsWith("ezs42"))
    // more anchors (independently derivable: equator/meridian corner
    // cell and a southern-hemisphere city — Sydney's well-known r3gx2)
    assert(gh(0.0, 0.0, 1) === "s")
    assert(gh(151.2093, -33.8688, 4) === "r3gx")
    // edge clamps (r12 self-audit): the +180/+90 corner quantizes into
    // the LAST cell (all-ones base32 'z'), never wraps to cell 0
    assert(gh(180.0, 90.0, 1) === "z")
    assert(gh(180.0, 90.0, 3) === "zzz")
    // ...and geotile clamps the poles into the Mercator edge rows
    // instead of diverging through tan(±90°)
    def gt(lon: Double, lat: Double): String =
      Seq((lon, lat)).toDF("lon", "lat")
        .select(GeoOps.geotileKey($"lon", $"lat", 6).as("t")).collect()(0).getString(0)
    assert(gt(0.0, 90.0) === "6/32/0")
    assert(gt(0.0, -90.0) === "6/32/63")
    assert(gt(180.0, 0.0) === "6/63/32")
    // the ES|QL functions ride the same fragments as the j259 agg
    val r = Seq(1).toDF("z").select(
      Esql.parseExpr("""ST_GEOHASH(TO_GEOPOINT("POINT(-5.603 42.605)"), 5)""").as("g"),
      Esql.parseExpr("""ST_GEOTILE(TO_GEOPOINT("POINT(0.1 0.1)"), 6)""").as("t")).collect()(0)
    assert(r.getString(0) === "ezs42")
    assert(r.getString(1) === "6/32/31") // just NE of the origin corner
  }

  test("geohex anchors: origin cell, tessellation identity, edge sweep (poles/antimeridian), ES|QL agreement") {
    import s.implicits._
    // reference implementation of the SAME cube-round in scalar doubles —
    // the Column/SQL forms must agree with it point by point
    def refHex(lon: Double, lat: Double, p: Int): String = {
      val size = 10.0 / (1 << p)
      val qf = (math.sqrt(3.0) / 3.0 * lon - lat / 3.0) / size
      val rf = (lat * 2.0 / 3.0) / size
      val yf = -qf - rf
      val rx = math.floor(qf + 0.5); val ry = math.floor(yf + 0.5)
      val rz = math.floor(rf + 0.5)
      val (dx, dy, dz) = (math.abs(rx - qf), math.abs(ry - yf), math.abs(rz - rf))
      val q = if (dx > dy && dx > dz) -ry - rz else rx
      val r = if (!(dx > dy && dx > dz) && !(dy > dz)) -rx - ry else rz
      s"${q.toLong},${r.toLong}"
    }
    // edge sweep: origin, poles band (±85), antimeridian (±180), the
    // fixture's exact 2dp lattice corners, and off-axis interior points
    val pts = Seq((0.0, 0.0), (-180.0, -85.0), (179.99, 84.99),
      (-180.0, 84.99), (179.99, -85.0), (-74.0, 40.7), (0.01, -0.01),
      (12.34, -56.78), (-0.005, 0.005), (100.0, 0.0), (0.0, 50.0))
    val got = pts.toDF("lon", "lat")
      .select(GeoOps.geohexKey($"lon", $"lat", 2).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === pts.map { case (lo, la) => refHex(lo, la, 2) },
      "Column form must equal the scalar reference on the edge sweep")
    assert(got.head === "0,0", "origin sits in the origin cell")
    // tessellation identity: every point's cell center is within one
    // cell circumradius (size / cos(30°) = size·2/√3) of the point in
    // the axial plane — no point falls between cells
    val size = 2.5
    for (((lo, la), cell) <- pts.zip(got)) {
      val Array(q, r) = cell.split(",").map(_.toLong)
      val cx = size * (math.sqrt(3.0) * q + math.sqrt(3.0) / 2.0 * r)
      val cy = size * 1.5 * r
      val d = math.hypot(lo - cx, la - cy)
      assert(d <= size * 2.0 / math.sqrt(3.0) + 1e-9,
        s"($lo,$la) → $cell center ($cx,$cy) is $d away — outside the hex")
    }
    // ES|QL ST_GEOHEX agrees with the direct Column form on the fixture
    val viaEsql = Esql.compile(s, TestSpark.sf0001,
      """FROM events
        || EVAL lat = (event_id * 7919 % 17000) / 100.0 - 85.0, lon = (event_id * 104729 % 36000) / 100.0 - 180.0
        || EVAL p = TO_GEOPOINT(CONCAT("POINT(", TO_STRING(lon), " ", TO_STRING(lat), ")"))
        || EVAL hx = ST_GEOHEX(p, 2)
        || KEEP event_id, hx
        || SORT event_id
        || LIMIT 50""".stripMargin).collect().map(r => (r.getLong(0), r.getString(1)))
    val want = Tables.events(s, TestSpark.sf0001)
      .withColumn("lat", GeoOps.synthLat($"event_id"))
      .withColumn("lon", GeoOps.synthLon($"event_id"))
      .select($"event_id", GeoOps.geohexKey($"lon", $"lat", 2))
      .orderBy($"event_id").limit(50)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaEsql.toSeq === want.toSeq)
  }

  test("BBOX geo_shape contract: boundary-inclusive relations, CONTAINS arg order, malformed → NULL") {
    import s.implicits._
    def rel(f: String, wkt: String): Any = {
      val r = Seq(1).toDF("z").select(Esql.parseExpr(f.replace("$W", wkt)).as("v")).collect()(0)
      if (r.isNullAt(0)) null else r.getBoolean(0)
    }
    val env = """TO_GEOSHAPE("BBOX (-10.0, 10.0, 5.0, -5.0)")"""
    // interior, exact boundary (inclusive — the BKD convention), outside
    assert(rel(s"""ST_INTERSECTS(TO_GEOPOINT("POINT(0.0 0.0)"), $$W)""", env) === true)
    assert(rel(s"""ST_WITHIN(TO_GEOPOINT("POINT(10.0 5.0)"), $$W)""", env) === true)
    assert(rel(s"""ST_CONTAINS($$W, TO_GEOPOINT("POINT(-10.0 -5.0)"))""", env) === true)
    assert(rel(s"""ST_DISJOINT(TO_GEOPOINT("POINT(10.1 0.0)"), $$W)""", env) === true)
    assert(rel(s"""ST_INTERSECTS(TO_GEOPOINT("POINT(0.0 5.1)"), $$W)""", env) === false)
    // malformed shape → NULL, and NULL propagates through the relation
    assert(rel(s"""ST_INTERSECTS(TO_GEOPOINT("POINT(0.0 0.0)"), $$W)""",
      """TO_GEOSHAPE("POLYGON((0 0))")""") === null)
  }

  test("POLYGON geo_shape: exact even-odd ray cast, concavity, envelope, malformed → NULL") {
    import s.implicits._
    def rel(f: String, wkt: String): Any = {
      val r = Seq(1).toDF("z").select(Esql.parseExpr(f.replace("$W", wkt)).as("v")).collect()(0)
      if (r.isNullAt(0)) null else r.getBoolean(0)
    }
    // j270's notched (non-convex) ring: bbox [-130,-60]×[10,45], with
    // the triangle notch (-60,45)-(-95,25)-(-130,45) cut from the top
    val poly = """TO_GEOSHAPE("POLYGON((-130.0 10.0, -60.0 10.0, -60.0 45.0, -95.0 25.0, -130.0 45.0, -130.0 10.0))")"""
    def win(lon: Double, lat: Double): Any =
      rel(s"""ST_WITHIN(TO_GEOPOINT("POINT($lon $lat)"), $$W)""", poly)
    assert(win(-95.0, 15.0) === true,  "deep interior")
    assert(win(-95.0, 40.0) === false, "inside the bbox but in the notch — the envelope test alone gets this WRONG")
    assert(win(-125.0, 40.0) === true, "left lobe above the notch")
    assert(win(-65.0, 40.0) === true,  "right lobe above the notch")
    assert(win(-140.0, 20.0) === false, "outside the bbox")
    // the relations algebra holds on polygons too
    assert(rel(s"""ST_INTERSECTS(TO_GEOPOINT("POINT(-95.0 15.0)"), $$W)""", poly) === true)
    assert(rel(s"""ST_CONTAINS($$W, TO_GEOPOINT("POINT(-95.0 15.0)"))""", poly) === true)
    assert(rel(s"""ST_DISJOINT(TO_GEOPOINT("POINT(-95.0 40.0)"), $$W)""", poly) === true)
    // envelope fields = the ring's bounding box (ST_XMIN/… read shapes)
    val e = Seq(1).toDF("z").select(
      Esql.parseExpr(s"ST_XMIN($poly)").as("x0"),
      Esql.parseExpr(s"ST_XMAX($poly)").as("x1"),
      Esql.parseExpr(s"ST_YMIN($poly)").as("y0"),
      Esql.parseExpr(s"ST_YMAX($poly)").as("y1"),
      Esql.parseExpr(s"ST_XMIN(ST_ENVELOPE($poly))").as("ex0")).collect()(0)
    assert(e.getDouble(0) === -130.0 && e.getDouble(1) === -60.0)
    assert(e.getDouble(2) === 10.0 && e.getDouble(3) === 45.0)
    assert(e.getDouble(4) === -130.0, "ST_ENVELOPE re-packs the bbox as a shape")
    // whitespace-tolerant parse (the TO_GEOPOINT rule applies to shapes)
    assert(rel(s"""ST_WITHIN(TO_GEOPOINT("POINT(0.5 0.5)"), $$W)""",
      """TO_GEOSHAPE("POLYGON ((  0 0 ,  1   0, 1 1, 0 1, 0 0 ))")""") === true)
    // polygons with HOLES (r13): the donut's ring band is IN, the hole
    // is OUT, and the hole of the hole-alone polygon is IN — even-odd
    // parity over the NULL-sentinel-separated rings
    val donut = """TO_GEOSHAPE("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))")"""
    def dwin(lon: Double, lat: Double): Any =
      rel(s"""ST_WITHIN(TO_GEOPOINT("POINT($lon $lat)"), $$W)""", donut)
    assert(dwin(1.0, 5.0) === true,  "ring band")
    assert(dwin(5.0, 5.0) === false, "inside the hole — parity must flip")
    assert(dwin(11.0, 5.0) === false, "outside the outer ring")
    assert(dwin(3.5, 6.5) === false, "hole corner region")
    // any number of holes
    val twoHoles = """TO_GEOSHAPE("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1), (6 6, 8 6, 8 8, 6 8, 6 6))")"""
    assert(rel(s"""ST_WITHIN(TO_GEOPOINT("POINT(2.0 2.0)"), $$W)""", twoHoles) === false)
    assert(rel(s"""ST_WITHIN(TO_GEOPOINT("POINT(7.0 7.0)"), $$W)""", twoHoles) === false)
    assert(rel(s"""ST_WITHIN(TO_GEOPOINT("POINT(5.0 5.0)"), $$W)""", twoHoles) === true)
    // the j273 containment algebra holds corpus-wide at sf0.001:
    // n_donut = n_solid − n_hole per group (hole strictly inside outer)
    val alg = Esql.compile(s, TestSpark.sf0001, Esql.j273Query).collect()
    assert(alg.nonEmpty)
    for (r <- alg) {
      val (nd, ns, nh) = (r.getLong(r.fieldIndex("n_donut")),
        r.getLong(r.fieldIndex("n_solid")), r.getLong(r.fieldIndex("n_hole")))
      assert(nd === ns - nh, s"algebra broke: $r")
    }
    assert(alg.map(_.getLong(alg(0).fieldIndex("n_hole"))).sum > 0,
      "fixture must actually have points in the hole")
    // malformed → NULL: unclosed ring (either ring), non-numeric
    // vertex, out-of-range vertex, wrong token counts, MULTIPOLYGON
    for (bad <- Seq(
      "POLYGON((0 0, 1 0, 1 1, 0 1))",              // unclosed
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2))", // unclosed hole
      "POLYGON((0 0, a 0, 1 1, 0 0))",              // non-numeric
      "POLYGON((0 0, 190 0, 1 95, 0 0, 0 0))",      // out of range
      "POLYGON((0, 1 0, 1 1, 0 0))",                // 1-token pair
      "POLYGON(0 0, 1 0, 1 1, 0 0)",                // missing ring parens
      "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)))",
      "LINESTRING(0 0, 1 1)"))
      assert(rel(s"""ST_WITHIN(TO_GEOPOINT("POINT(0.5 0.5)"), $$W)""",
        s"""TO_GEOSHAPE("$bad")""") === null, bad)
  }

  test("TO_GEOSHAPE literal fast path ≡ expression path, input by input") {
    import s.implicits._
    // the compile-time Scala parse (literal WKT → literal struct, the
    // j272 optimizer-blowup fix) must agree byte-for-byte with the
    // row-wise expression path on EVERY input class — valid, weird
    // whitespace, and each malformed family
    val inputs = Seq(
      "BBOX (-10.0, 10.0, 5.0, -5.0)",
      "BBOX(-1,2,3,-4)",
      " BBOX (-1, 2, 3, -4)",                       // leading space: NULL (both)
      "POLYGON((-130.0 10.0, -60.0 10.0, -60.0 45.0, -95.0 25.0, -130.0 45.0, -130.0 10.0))",
      "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))",
      "POLYGON ((  0 0 ,  1   0, 1 1, 0 1, 0 0 ))",
      "  POLYGON((0 0, 1 0, 1 1, 0 0))  ",
      "POLYGON((0.5 0.125, 1.25 0, 1 1, 0.5 0.125))",
      "POLYGON((0 0, 1 0, 1 1, 0 1))",              // unclosed
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2))",
      "POLYGON((0 0, a 0, 1 1, 0 0))",
      "POLYGON((0 0, 190 0, 1 95, 0 0, 0 0))",
      "POLYGON((0 0, NaN 0, 1 1, 0 0, 0 0))",
      "POLYGON((0, 1 0, 1 1, 0 0))",
      "POLYGON(0 0, 1 0, 1 1, 0 0)",
      "POLYGON(())", "POLYGON", "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)))",
      "LINESTRING(0 0, 1 1)", "garbage", "")
    for (w <- inputs) {
      val viaExpr = Seq(w).toDF("w")
        .select(Esql.parseExpr("TO_GEOSHAPE(w)").as("v")).collect()(0)
      val viaLit = Seq(1).toDF("z")
        .select(Esql.geoShapeLiteral(w).as("v")).collect()(0)
      assert(viaExpr.toString === viaLit.toString, s"paths diverge on: '$w'")
    }
  }

  test("WKT geo_point contract: malformed → NULL, round-trip exact, ST_DISTANCE composes") {
    import s.implicits._
    val df = Seq(
      ("POINT(-74.0 40.7)", 1L),
      ("POINT(12.5 -3.25)", 2L),
      ("LINESTRING(0 0, 1 1)", 3L),   // not a point → NULL
      ("POINT(x y)", 4L),             // non-numeric → NULL
      ("garbage", 5L),
      // ES's WKT reader tolerates whitespace — these are WELL-FORMED
      // (r12 advice: the exact-"POINT(" spelling wrongly NULLed them)
      ("POINT (3.5 7.25)", 6L),       // space before the paren
      ("POINT(  3.5   7.25  )", 7L),  // irregular internal runs
      ("  POINT(3.5 7.25)  ", 8L),    // leading/trailing space
      // out-of-range coordinates → NULL (ES refuses invalid geo_points;
      // without this a grid key could mint a cell ES never emits)
      ("POINT(-200.0 10.0)", 9L),
      ("POINT(10.0 95.0)", 10L)).toDF("w", "id")
      .select($"id",
        Esql.parseExpr("TO_GEOPOINT(w)").as("p"),
        Esql.parseExpr("ST_X(TO_GEOPOINT(w))").as("x"),
        Esql.parseExpr("ST_Y(TO_GEOPOINT(w))").as("y"))
      .orderBy($"id").collect()
    // p is the parsed {x,y} struct (the ONE parse — ST_* never re-reads text)
    assert(df(0).getStruct(1).getDouble(0) === -74.0)
    assert(df(0).getDouble(2) === -74.0 && df(0).getDouble(3) === 40.7)
    assert(df(1).getDouble(2) === 12.5 && df(1).getDouble(3) === -3.25)
    assert(df(2).isNullAt(1) && df(2).isNullAt(2))
    assert(df(3).isNullAt(1))
    assert(df(4).isNullAt(1))
    assert(df(5).getDouble(2) === 3.5 && df(5).getDouble(3) === 7.25)
    assert(df(6).getDouble(2) === 3.5 && df(6).getDouble(3) === 7.25)
    assert(df(7).getDouble(2) === 3.5 && df(7).getDouble(3) === 7.25)
    assert(df(8).isNullAt(1), "lon out of [-180,180] must NULL")
    assert(df(9).isNullAt(1), "lat out of [-90,90] must NULL")
    // ST_DISTANCE(p, p) == 0; one-degree-lon at the equator ≈ 111.195 km
    val d = Seq(1).toDF("z").select(
      Esql.parseExpr(
        """ST_DISTANCE(TO_GEOPOINT("POINT(1.0 0.0)"), TO_GEOPOINT("POINT(0.0 0.0)"))""")
        .as("d")).collect()(0).getDouble(0)
    assert(math.abs(d - 111195.0) < 10.0, s"got $d")
    // the double→string→double round-trip the j260 query relies on:
    // shortest-roundtrip formatting parses back to the EXACT source
    val rt = Tables.events(s, TestSpark.sf0001)
      .select(GeoOps.synthLat($"event_id").as("lat"),
        GeoOps.synthLon($"event_id").as("lon"))
      .select($"lat", $"lon", Esql.parseExpr(
        """ST_Y(TO_GEOPOINT(CONCAT("POINT(", TO_STRING(lon), " ", TO_STRING(lat), ")")))""")
        .as("back"))
      .filter(!($"back" <=> $"lat")).count()
    assert(rt === 0L, "WKT round-trip must be bit-exact")
  }
}
