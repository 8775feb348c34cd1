"""The reference's SQL views re-expressed as DataFrame plans
(sql/views.sql:8-85).  Each function takes a Warehouse and returns the
view frame; ``build_views`` registers them all as temp views so
``spark.sql`` queries see the same names a reference user knows.

Join shape notes: every dimension side here is a (deduplicated) small
table — Catalyst broadcasts them; the only fact-sized inputs are
Specimen/Aliquot/Sample/RawData chains which join on their FK keys.
DISTINCT mirrors the reference's SELECT DISTINCT exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..normalize import Warehouse


def specimen_view(wh: Warehouse) -> DataFrame:
    """SpecimenView = Specimen ⋈ Experiment ⋈ Study (views.sql:8-20)."""
    sp = wh.table("Specimen")
    ex = wh.table("Experiment")
    st = wh.table("Study")
    return (
        sp.join(ex, sp.Experiment_idExperiment == ex.idExperiment)
        .join(st, ex.Study_idStudy == st.idStudy)
        .select(
            "idSpecimen",
            "SpecimenID",
            sp.user_id,
            "SpecimenCollectionDate",
            "SpecimenNotes",
            "SpecimenCollectionTime",
            "SpecimenWeight",
            "SpecimenWeightUnit",
            "StudyName",
        )
    )


def sample_view(wh: Warehouse) -> DataFrame:
    """SampleView = Sample ⋈ SampleProtocol ⋈ SampleProtocols (views.sql:25-38)."""
    sa = wh.table("Sample")
    sp = wh.table("SampleProtocol")
    sps = wh.table("SampleProtocols")
    return (
        sa.join(sp, sa.SampleProtocol_idSampleProtocol == sp.idSampleProtocol)
        .join(sps, sp.SampleProtocols_idSampleProtocols == sps.idSampleProtocols)
        .select(
            "idSample",
            "Aliquot_idAliquot",
            "SampleID",
            "SampleDatePerformed",
            "SampleProcessor",
            "SampleProtocolNotes",
            "SampleProtocolID",
            "SampleConditions",
            "SampleTool",
            "SampleToolVersion",
        )
    )


def subject_type_view(wh: Warehouse) -> DataFrame:
    """SubjectTypeView (views.sql:43-51): SubjectType ⋈ junction ⋈
    Experiment ⋈ Study."""
    st = wh.table("SubjectType")
    j = wh.table("SubjectType_has_Experiment")
    ex = wh.table("Experiment")
    study = wh.table("Study")
    return (
        st.join(j, st.idSubjectType == j.SubjectType_idSubjectType)
        .join(ex, j.Experiment_idExperiment == ex.idExperiment)
        .join(study, ex.Study_idStudy == study.idStudy)
        .select("StudyName", "Subjects_idSubjects", "AnimalSubjects_idAnimalSubjects")
    )


def subject_table(wh: Warehouse) -> DataFrame:
    """SubjectTable (views.sql:67-70): the wide human-subject denorm with
    ICD reassembly ``CONCAT(First, Category, '.', Details, Extension)``."""
    s = wh.table("Subjects").alias("s")
    she = wh.table("Subjects_has_Ethnicity").alias("she")
    eth = wh.table("Ethnicity").alias("eth")
    shg = wh.table("Subjects_has_Genotypes").alias("shg")
    gen = wh.table("Genotypes").alias("gen")
    hei = wh.table("Heights").alias("hei")
    ill = wh.table("Illness").alias("ill")
    ild = wh.table("IllnessDetails").alias("ild")
    ilc = wh.table("IllnessCategory").alias("ilc")
    ilb = wh.table("IllnessBroadCategory").alias("ilb")
    itv = wh.table("Intervention").alias("itv")
    itvs = wh.table("Interventions").alias("itvs")
    wei = wh.table("Weights").alias("wei")
    styp = wh.table("SubjectType").alias("styp")
    return (
        s.join(she, F.col("s.idSubjects") == F.col("she.Subjects_idSubjects"))
        .join(eth, F.col("she.Ethnicity_idEthnicity") == F.col("eth.idEthnicity"))
        .join(shg, F.col("s.idSubjects") == F.col("shg.Subjects_idSubjects"))
        .join(gen, F.col("shg.Genotypes_idGenotypes") == F.col("gen.idGenotypes"))
        .join(hei, F.col("s.idSubjects") == F.col("hei.Subjects_idSubjects"))
        .join(ill, F.col("s.idSubjects") == F.col("ill.Subjects_idSubjects"))
        .join(ild, F.col("ill.IllnessDetails_idIllnessDetails") == F.col("ild.idIllnessDetails"))
        .join(ilc, F.col("ild.IllnessCategory_idIllnessCategory") == F.col("ilc.idIllnessCategory"))
        .join(
            ilb,
            F.col("ilc.IllnessBroadCategory_idIllnessBroadCategory")
            == F.col("ilb.idIllnessBroadCategory"),
        )
        .join(itv, F.col("s.idSubjects") == F.col("itv.Subjects_idSubjects"))
        .join(itvs, F.col("itv.Interventions_idInterventions") == F.col("itvs.idInterventions"))
        .join(wei, F.col("s.idSubjects") == F.col("wei.Subjects_idSubjects"))
        .join(styp, F.col("s.idSubjects") == F.col("styp.Subjects_idSubjects"))
        .select(
            F.col("s.idSubjects").alias("idSubjects"),
            F.col("styp.idSubjectType").alias("idSubjectTypeHuman"),
            "Ethnicity",
            "Genotype",
            "Height",
            "HeightDateCollected",
            F.concat(
                F.col("ilb.ICDFirstCharacter"),
                F.col("ilc.ICDCategory"),
                F.lit("."),
                F.col("ild.ICDDetails"),
                F.col("ild.ICDExtension"),
            ).alias("ICDCode"),
            "IllnessInstanceID",
            "IllnessStartDate",
            "IllnessEndDate",
            "IllnessNotes",
            "InterventionStartDate",
            "InterventionEndDate",
            "InterventionNotes",
            "InterventionCode",
            "InterventionName",
            "InterventionType",
            "BirthYear",
            "HostSubjectId",
            "Nationality",
            F.col("s.Sex").alias("SexHuman"),
            "Weight",
            "WeightDateCollected",
        )
        .distinct()
    )


def animal_subject_table(wh: Warehouse) -> DataFrame:
    """AnimalSubjectTable (views.sql:72-75)."""
    a = wh.table("AnimalSubjects").alias("a")
    styp = wh.table("SubjectType").alias("styp")
    fac = wh.table("Facility").alias("fac")
    ven = wh.table("Vendor").alias("ven")
    stn = wh.table("Strain").alias("stn")
    spc = wh.table("Species").alias("spc")
    hus = wh.table("Husbandry").alias("hus")
    hd = wh.table("HousingDates").alias("hd")
    hou = wh.table("Housing").alias("hou")
    cd = wh.table("ChowDates").alias("cd")
    cho = wh.table("Chow").alias("cho")
    return (
        a.join(styp, F.col("a.idAnimalSubjects") == F.col("styp.AnimalSubjects_idAnimalSubjects"))
        .join(fac, F.col("a.Facility_idFacility") == F.col("fac.idFacility"))
        .join(ven, F.col("a.Vendor_idVendor") == F.col("ven.idVendor"))
        .join(stn, F.col("a.Strain_idStrain") == F.col("stn.idStrain"))
        .join(spc, F.col("stn.Species_idSpecies") == F.col("spc.idSpecies"))
        .join(hus, F.col("a.Husbandry_idHusbandry") == F.col("hus.idHusbandry"))
        .join(hd, F.col("a.idAnimalSubjects") == F.col("hd.AnimalSubjects_idAnimalSubjects"))
        .join(hou, F.col("hd.Housing_idHousing") == F.col("hou.idHousing"))
        .join(cd, F.col("a.ChowDates_idChowDates") == F.col("cd.idChowDates"))
        .join(cho, F.col("cd.Chow_idChow") == F.col("cho.idChow"))
        .select(
            F.col("a.idAnimalSubjects").alias("idAnimalSubjects"),
            F.col("styp.idSubjectType").alias("idSubjectTypeAnimal"),
            "BirthDate",
            "AnimalWeight",
            F.col("a.Sex").alias("SexAnimal"),
            "AnimalSubjectID",
            "SubjectType",
            "FacilityName",
            "FacilityLocation",
            "VendorName",
            "VendorLocation",
            "VendorStrainInfo",
            "StrainName",
            "StrainProducer",
            "StrainID",
            "SpeciesName",
            "BreedingProgram",
            "LightDarkCycle",
            "Temperature",
            "EnvironmentalEnrichment",
            "TypeOfFacility",
            "TypeOfBedding",
            "TypeOfHousing",
            "NumberOfCageCompanions",
            "TankShape",
            "TankMaterial",
            "TankID",
            "HousingStartDate",
            "HousingEndDate",
            "ChowStartDate",
            "ChowEndDate",
            "Company",
            "ProductName",
            "ProductCode",
        )
        .distinct()
    )


def specimen_table(wh: Warehouse) -> DataFrame:
    """SpecimenTable (views.sql:77-80): the 13-way spine flatten."""
    sp = wh.table("Specimen").alias("sp")
    al = wh.table("Aliquot").alias("al")
    bs = wh.table("BodySite").alias("bs")
    cs = wh.table("CollectionSite").alias("cs")
    ex = wh.table("Experiment").alias("ex")
    st = wh.table("Study").alias("st")
    lab = wh.table("Lab").alias("lab")
    sl = wh.table("StorageLocation").alias("sl")
    sa = wh.table("Sample").alias("sa")
    rd = wh.table("RawData").alias("rd")
    rdp = wh.table("RawDataProtocol").alias("rdp")
    rdps = wh.table("RawDataProtocols").alias("rdps")
    res = wh.table("Results").alias("res")
    rp = wh.table("ResultsProtocol").alias("rp")
    rps = wh.table("ResultsProtocols").alias("rps")
    sap = wh.table("SampleProtocol").alias("sap")
    saps = wh.table("SampleProtocols").alias("saps")
    ty = wh.table("Type").alias("ty")
    styp = wh.table("SubjectType").alias("styp")
    return (
        sp.join(al, F.col("sp.idSpecimen") == F.col("al.Specimen_idSpecimen"))
        .join(bs, F.col("sp.BodySite_idBodySite") == F.col("bs.idBodySite"))
        .join(cs, F.col("sp.CollectionSite_idCollectionSite") == F.col("cs.idCollectionSite"))
        .join(ex, F.col("sp.Experiment_idExperiment") == F.col("ex.idExperiment"))
        .join(st, F.col("ex.Study_idStudy") == F.col("st.idStudy"))
        .join(lab, F.col("st.Lab_idLab") == F.col("lab.idLab"))
        .join(sl, F.col("sp.StorageLocation_idStorageLocation") == F.col("sl.idStorageLocation"))
        .join(sa, F.col("al.idAliquot") == F.col("sa.Aliquot_idAliquot"))
        .join(rd, F.col("sa.idSample") == F.col("rd.Sample_idSample"))
        .join(rdp, F.col("rd.RawDataProtocol_idRawDataProtocol") == F.col("rdp.idRawDataProtocol"))
        .join(
            rdps,
            F.col("rdp.RawDataProtocols_idRawDataProtocols") == F.col("rdps.idRawDataProtocols"),
        )
        .join(res, F.col("rd.Sample_idSample") == F.col("res.RawData_Sample_idSample"))
        .join(rp, F.col("res.ResultsProtocol_idResultsProtocol") == F.col("rp.idResultsProtocol"))
        .join(
            rps,
            F.col("rp.ResultsProtocols_idResultsProtocols") == F.col("rps.idResultsProtocols"),
        )
        .join(sap, F.col("sa.SampleProtocol_idSampleProtocol") == F.col("sap.idSampleProtocol"))
        .join(
            saps,
            F.col("sap.SampleProtocols_idSampleProtocols") == F.col("saps.idSampleProtocols"),
        )
        .join(ty, F.col("sp.Type_idType") == F.col("ty.idType"))
        .join(styp, F.col("sp.SubjectType_idSubjectType") == F.col("styp.idSubjectType"))
        .select(
            F.col("sp.idSpecimen").alias("idSpecimen"),
            F.col("styp.idSubjectType").alias("idSubjectType"),
            "AliquotID",
            "AliquotWeight",
            "AliquotWeightUnit",
            "SpecimenBodySite",
            "UberonCodeBodySite",
            "Biome",
            "CollectionSiteName",
            "CollectionSiteTechnician",
            "Depth",
            "Elevation",
            "Environment",
            "Feature",
            "Latitude",
            "Longitude",
            "Material",
            "ExperimentName",
            "ContactEmail",
            "ContactName",
            "PrimaryInvestigator",
            "BarcodeSequence",
            "LinkerPrimerSequence",
            "RawDataID",
            "RawDataNotes",
            "RawDataDatePerformed",
            "RawDataProcessor",
            "RawDataProtocolID",
            "FinishingStrategyCoverage",
            "FinishingStrategyStatus",
            "NumberOfContigs",
            "SequencingMethod",
            "TargetGene",
            "ResultID",
            "ResultsLocation",
            "ResultsDatePerformed",
            "ResultsProcessor",
            "ResultsProtocolID",
            "ResultsMethod",
            "ResultsTool",
            "ResultsToolVersion",
            "SampleID",
            "SampleWeight",
            "SampleWeightUnit",
            "SampleDatePerformed",
            "SampleProcessor",
            "SampleProtocolID",
            "SampleProtocolNotes",
            "SampleConditions",
            "SampleTool",
            "SampleToolVersion",
            "SpecimenCollectionDate",
            "SpecimenCollectionMethod",
            "SpecimenCollectionTime",
            "SpecimenID",
            "SpecimenNotes",
            "SpecimenWeight",
            "SpecimenWeightUnit",
            "StorageInstitution",
            "StorageFreezer",
            "RelevantLinks",
            "StudyName",
            "StudyType",
            "SpecimenType",
            "UberonCodeType",
        )
        .distinct()
    )


def meta_analysis_view(wh: Warehouse) -> DataFrame:
    """MetaAnalysisView (views.sql:82-85): SpecimenTable LEFT JOIN the two
    polymorphic subject denorms, DISTINCT."""
    spec = specimen_table(wh)
    subj = subject_table(wh)
    animal = animal_subject_table(wh)
    return (
        spec.join(subj, spec.idSubjectType == subj.idSubjectTypeHuman, "left")
        .join(animal, spec.idSubjectType == animal.idSubjectTypeAnimal, "left")
        .distinct()
    )


VIEWS = {
    "SpecimenView": specimen_view,
    "SampleView": sample_view,
    "SubjectTypeView": subject_type_view,
    "SubjectTable": subject_table,
    "AnimalSubjectTable": animal_subject_table,
    "SpecimenTable": specimen_table,
    "MetaAnalysisView": meta_analysis_view,
}


def build_views(wh: Warehouse) -> dict[str, DataFrame]:
    out = {}
    for name, fn in VIEWS.items():
        df = fn(wh)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
