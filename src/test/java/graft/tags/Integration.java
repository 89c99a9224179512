package graft.tags;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Priority-2 tier (the reference's inverted test pyramid): specs that
 * exercise one infrastructure component (the in-process FTP server,
 * filesystem staging, stream connectors) but not the full stack.
 * Untagged suites are the priority-3 Unit tier.
 */
@TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface Integration {}
