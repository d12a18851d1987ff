package graft.shim;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;

/**
 * Bridges a custom {@link LogicalPlan} into a {@code DataFrame}.
 *
 * <p>{@code Dataset.ofRows} is {@code private[sql]} at the Scala level but a
 * public static method in bytecode; calling it from Java is the standard way
 * extension libraries materialize their own logical operators (the
 * alternative — declaring Scala code inside the {@code org.apache.spark.sql}
 * package — hides the dependency instead of isolating it here).
 */
public final class Datasets {
  private Datasets() {}

  public static Dataset<Row> ofRows(SparkSession spark, LogicalPlan plan) {
    return org.apache.spark.sql.classic.Dataset.ofRows(
        (org.apache.spark.sql.classic.SparkSession) spark, plan);
  }
}
