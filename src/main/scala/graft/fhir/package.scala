package graft

/** FHIR ingestion and conversion (the reference's bundles/encoders
  * surface, Spark-first).
  *
  *   - [[graft.fhir.Bundles]] — bundle directory scans, bundles from
  *     JSON/XML columns, resource extraction (with contained
  *     resources), save-as-database, toJson/toBundle/resourceToXml.
  *   - [[graft.fhir.FhirSchemas]] — profile-driven composite encoders:
  *     FHIR resource JSON ⇄ Spark rows with choice types, contained
  *     resources, leaf-extension hoisting, enum scrubbing, relative
  *     `<type>Id` synthesis.
  *   - [[graft.fhir.FhirJson]] / [[graft.fhir.FhirXml]] — decode/encode
  *     kernels (StAX XML→JSON, canonical JSON emission).
  *   - [[graft.fhir.FhirAvro]] / [[graft.fhir.FhirCodegen]] — Avro
  *     schema backend and generated specific-record analogs.
  *   - [[graft.fhir.StructureDefinitions]] /
  *     [[graft.fhir.ProfileProvider]] — structure-definition parsing
  *     and US-Core profile resolution.
  *   - [[graft.fhir.TerminologyResources]] — ValueSet/ConceptMap
  *     resource import (JSON+XML directories) and canonical
  *     re-nesting for export.
  */
package object fhir
