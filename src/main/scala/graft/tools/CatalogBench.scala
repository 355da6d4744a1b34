package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Column => V2Column, Identifier, TableCatalog, TableInfo}
import org.apache.spark.sql.types.StructType

/** Catalog-operation microbench against the BASELINE.md targets:
  * create/describe/exists/drop p50 < 10 ms on the in-memory backend, and
  * listTables over 1,000 declared tables < 200 ms (include_declared path —
  * no storage probes). Run: `sbt "runMain graft.tools.CatalogBench"`. */
object CatalogBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.catalog.cb", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.cb.backend", "memory")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cat = spark.sessionState.catalogManager.catalog("cb")
      .asInstanceOf[TableCatalog with org.apache.spark.sql.connector.catalog.SupportsNamespaces]
    cat.createNamespace(Array("db"), java.util.Collections.emptyMap())
    val schema = StructType.fromDDL("id BIGINT, text STRING")
    val columns = schema.fields.map(f => V2Column.create(f.name, f.dataType))
    val tableInfo = new TableInfo.Builder()
      .withColumns(columns)
      .withProperties(java.util.Collections.singletonMap("table_type", "lance"))
      .build()

    def p50(label: String, n: Int)(f: Int => Unit): Unit = {
      val times = (0 until n).map { i =>
        val t0 = System.nanoTime(); f(i); (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"CATBENCH $label%-28s p50=${times(n / 2)}%8.3f ms  p99=${times((n * 99) / 100 min (n - 1))}%8.3f ms")
    }

    // warm the code paths once
    cat.createTable(Identifier.of(Array("db"), "warm"), tableInfo)
    cat.loadTable(Identifier.of(Array("db"), "warm"))

    // every 20th table is an index capability pointer, so the inventory
    // receipt below filters 50 indexes out of 1,001 tables
    val idxProps = new java.util.HashMap[String, String]()
    idxProps.put("table_type", "lance")
    idxProps.put("graft.index.type", "bitmap")
    idxProps.put("graft.index.metric", "equality")
    idxProps.put("graft.index.m", "0")
    val indexInfo = new TableInfo.Builder()
      .withColumns(columns).withProperties(idxProps).build()
    p50("createTable (declared)", 1000) { i =>
      cat.createTable(Identifier.of(Array("db"), s"t$i"),
        if (i % 20 == 0) indexInfo else tableInfo)
    }
    p50("describeTable (loadTable)", 1000) { i =>
      cat.loadTable(Identifier.of(Array("db"), s"t$i"))
    }
    p50("tableExists", 1000) { i =>
      cat.tableExists(Identifier.of(Array("db"), s"t$i"))
    }
    val t0 = System.nanoTime()
    val listed = cat.listTables(Array("db"))
    println(f"CATBENCH listTables(${listed.length}) once   ${(System.nanoTime() - t0) / 1e6}%8.3f ms")
    p50("listTables (1001 tables)", 100) { _ => cat.listTables(Array("db")) }
    // index-inventory receipt: the BATCHED path (one listing + one bulk
    // describe) vs the per-table SHOW TBLPROPERTIES N+1 it replaced
    p50("listIndexTables (1001 tbls)", 20) { _ =>
      graft.ops.AnnIndex.listIndexTables(spark, "cb.db").collect()
    }
    p50("inventory via N+1 (contrast)", 3) { _ =>
      spark.sql("SHOW TABLES IN cb.db").collect()
        .map(r => s"cb.db.${r.getString(1)}")
        .foreach(t => spark.sql(s"SHOW TBLPROPERTIES $t").collect())
    }
    p50("dropTable", 1000) { i =>
      cat.dropTable(Identifier.of(Array("db"), s"t$i"))
    }
    spark.stop()
  }
}
