package graft.bookorders

import org.apache.spark.sql.types._

/** Declared schemas for the Book Orders operational database — no
  * inference, mirroring the reference DDL
  * (BookOrdersDatabaseDump_17.sql:42–115; SURVEY §1).
  *
  * Type mapping (SURVEY §1 table): integer->Int, smallint->Short,
  * char(n)->String stored TRIMMED (bpchar padding normalized, §7.1),
  * numeric(6,2)->Decimal(6,2), date->Date.
  */
object Model {

  val author: StructType = StructType(Seq(
    StructField("authorid", IntegerType, nullable = false),
    StructField("name", StringType, nullable = true), // the one nullable col
    StructField("surname", StringType, nullable = false)))

  val book: StructType = StructType(Seq(
    StructField("isbn", IntegerType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("edition_no", ShortType, nullable = false), // DEFAULT 1
    StructField("price", DecimalType(6, 2), nullable = false)))

  val bookAuthor: StructType = StructType(Seq(
    StructField("isbn", IntegerType, nullable = false),
    StructField("authorid", IntegerType, nullable = false),
    StructField("authorseqno", ShortType, nullable = false))) // DEFAULT 1

  val custOrder: StructType = StructType(Seq(
    StructField("orderid", IntegerType, nullable = false),
    StructField("orderdate", DateType, nullable = false),
    StructField("customerid", IntegerType, nullable = false)))

  val customer: StructType = StructType(Seq(
    StructField("customerid", IntegerType, nullable = false),
    StructField("l_name", StringType, nullable = false),
    StructField("f_name", StringType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("district", StringType, nullable = false),
    StructField("country", StringType, nullable = false)))

  val orderDetail: StructType = StructType(Seq(
    StructField("orderid", IntegerType, nullable = false),
    StructField("item_no", ShortType, nullable = false),
    StructField("isbn", IntegerType, nullable = false), // DEFAULT 0
    StructField("quantity", ShortType, nullable = false))) // DEFAULT 1

  val all: Map[String, StructType] = Map(
    "author" -> author,
    "book" -> book,
    "book_author" -> bookAuthor,
    "cust_order" -> custOrder,
    "customer" -> customer,
    "order_detail" -> orderDetail)

  /** Primary keys (asserted, not engine-enforced — SURVEY §1 mapping). */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "author" -> Seq("authorid"),
    "book" -> Seq("isbn"),
    "book_author" -> Seq("isbn", "authorid"),
    "cust_order" -> Seq("orderid"),
    "customer" -> Seq("customerid"),
    "order_detail" -> Seq("orderid", "item_no"))
}
