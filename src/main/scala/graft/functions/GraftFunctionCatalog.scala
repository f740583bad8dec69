package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, FunctionCatalog}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 FUNCTION CATALOG exemplar — the remaining function
  * extension surface beside UDF/UDAF/UDTF and native Catalyst
  * expressions: a catalog-resolved V2 function invoked from plain SQL as
  * `graftfns.default.hamming64(a, b)` once
  * `spark.sql.catalog.graftfns = graft.functions.GraftFunctionCatalog`
  * is set. V2 functions resolve through the catalog (no session-registry
  * mutation), version with the catalog, and — via the `invoke` MAGIC
  * METHOD below — compile to a static call inside whole-stage codegen
  * instead of boxing through `produceResult` rows (Spark prefers the
  * magic method when the signature matches the bound types exactly).
  *
  * `hamming64(a, b)` = popcount(a XOR b) — the 64-bit hamming distance
  * the SimHash dedup family compares fingerprints with; DuckDB restates
  * it exactly as `bit_count(xor(a, b))`, keeping the surface
  * oracle-able.
  */
class GraftFunctionCatalog extends CatalogPlugin with FunctionCatalog {
  private var catalogName = "graftfns"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name
  override def name(): String = catalogName

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("default")))
      Array(Identifier.of(Array("default"), "hamming64"))
    else Array.empty

  // the namespace is checked (not ignored) and a miss throws Spark's
  // NoSuchFunctionException, so a typo surfaces as the analyzer's clean
  // FUNCTION_NOT_FOUND error — and graftfns.bogus_ns.hamming64 does not
  // resolve at all — instead of an internal-looking NoSuchElementException
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().sameElements(Array("default")) &&
        ident.name() == "hamming64") Hamming64Unbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
}

object Hamming64Unbound extends UnboundFunction {
  override def name(): String = "hamming64"
  override def description(): String =
    "hamming64(a BIGINT, b BIGINT) -> BIGINT: popcount(a XOR b)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields.forall(_.dataType == LongType),
      s"hamming64 expects (BIGINT, BIGINT), got $inputType")
    new Hamming64
  }
}

class Hamming64 extends ScalarFunction[java.lang.Long] {
  override def name(): String = "hamming64"
  override def canonicalName(): String = "graft.hamming64"
  override def inputTypes(): Array[DataType] = Array(LongType, LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false

  /** Magic method: Spark's resolver binds this static-shape signature
    * directly into codegen (Invoke on the function instance), so the
    * hot path never materializes an InternalRow per call.
    */
  def invoke(a: Long, b: Long): Long = java.lang.Long.bitCount(a ^ b).toLong

  /** Interpreted fallback (also the semantic definition). */
  override def produceResult(input: InternalRow): java.lang.Long =
    java.lang.Long.bitCount(input.getLong(0) ^ input.getLong(1)).toLong
}
