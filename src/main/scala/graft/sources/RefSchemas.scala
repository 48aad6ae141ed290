package graft.sources

import org.apache.spark.sql.types._

/** The reference's pinned at-rest schemas (SURVEY.md §1; main.py:141-170
  * dtype maps), as Spark StructTypes plus the JDBC column-type DDL
  * fragments that reproduce the exact Postgres column types.
  */
object RefSchemas {

  /** accounts — main.py:141-144 */
  val accounts: StructType = StructType(Seq(
    StructField("account_id", LongType),
    StructField("client_id", StringType)))

  /** clients — main.py:151-156 */
  val clients: StructType = StructType(Seq(
    StructField("client_id", StringType),
    StructField("client_name", StringType),
    StructField("client_email", StringType),
    StructField("client_birth_date", DateType)))

  /** transactions — main.py:163-170 */
  val transactions: StructType = StructType(Seq(
    StructField("transaction_id", LongType),
    StructField("timestamp", TimestampType),
    StructField("account_id", LongType),
    StructField("amount", DecimalType(10, 2)),
    StructField("type", StringType),
    StructField("medium", StringType)))

  /** `createTableColumnTypes` fragments — the varchar widths and numeric
    * precision the reference pins (main.py:142-144, 152-156, 164-170).
    */
  val accountsColumnTypes: String =
    "account_id BIGINT, client_id VARCHAR(50)"
  val clientsColumnTypes: String =
    "client_id VARCHAR(50), client_name VARCHAR(50), " +
      "client_email VARCHAR(40), client_birth_date DATE"
  val transactionsColumnTypes: String =
    "transaction_id BIGINT, timestamp TIMESTAMP, account_id BIGINT, " +
      "amount DECIMAL(10,2), type VARCHAR(5), medium VARCHAR(10)"
}
