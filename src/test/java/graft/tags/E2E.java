package graft.tags;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Priority-1 tier (the reference's inverted test pyramid,
 * scripts/run_tests.sh:116-190 / pytest.ini markers): end-to-end specs
 * that drive the full stack — source server, pipeline, sink — and
 * whose green run VALIDATES the system without needing lower tiers.
 * Class-level: tags every test in the annotated suite.
 */
@TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface E2E {}
