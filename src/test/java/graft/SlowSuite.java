package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Class-level ScalaTest tag for the heavyweight suites (property
 * batteries, streaming crash matrices, the full query-contract sweep).
 * The FULL suite stays the gate; this tag exists so mid-round iteration
 * has a fast smoke tier:
 *
 *   sbt "testOnly * -- -l graft.SlowSuite"   # smoke tier (~minutes)
 *   sbt test                                 # the gate (everything)
 */
@TagAnnotation
@Inherited
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.TYPE})
public @interface SlowSuite {}
