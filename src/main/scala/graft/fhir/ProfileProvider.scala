package graft.fhir

/** Conformance-pack SPI — the analog of the reference's `ProfileProvider`
  * (bunsen-core/src/main/java/com/cerner/bunsen/ProfileProvider.java,
  * loaded by FhirContexts.loadProfiles via ServiceLoader): an
  * implementation contributes StructureDefinition (or whole conformance)
  * JSON documents, discovered from `META-INF/services` entries by
  * [[StructureDefinitions.fromProviders]], so shipping a jar with a
  * provider extends the schema registry without code changes. */
trait ProfileProvider {

  /** The conformance JSON documents to compile. Non-StructureDefinition
    * resources are permitted and ignored by the compiler, so a whole
    * conformance directory's contents can be returned as-is. */
  def definitions: Seq[String]
}

/** The shipped US-Core STU3 pack, contributed through the SPI — the
  * reference registers `UsCoreStu3ProfileProvider` the same way
  * (bunsen-uscore-resources-stu3/.../UsCoreStu3ProfileProvider.java:17-60
  * + its META-INF/services entry). */
final class UsCoreProfileProvider extends ProfileProvider {
  override def definitions: Seq[String] =
    StructureDefinitions.classpathDefinitions()
}
