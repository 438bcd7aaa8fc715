"""Golden-literal DuckDB oracles for the seeded iterative kernels.

These five queries (beta-mixture EM, the composed MethylMix lifecycle,
DriverNet permutation significance, the NB count GLM, the PCA batch
check) have no ANSI-SQL-expressible oracle: each is an iterative /
eigen / EM algorithm.  Their outputs ARE deterministic — fixed seeds,
hash-derived cohorts, bit-identical across independent SparkSessions
(verified in tests/test_golden_oracles.py) — so the expected output at
the driver's correctness scale (sf0.01) is pinned here as a VALUES
table, regression-locking the full kernel pipeline the way the
reference pins its own golden outputs in tests.

Validity is scale-bound: these literals encode sf0.01 inputs (the only
scale the driver's oracle compare runs at).  Each kernel's *semantics*
are independently verified by the numpy-replica and property tests in
tests/ (see the reference file:line in each entry); this module only
freezes the already-verified values so the driver's hash compare covers
them round over round.
"""

# reference semantics: MethylMix/MethylMix.R:313-419 (blc_2 EM + BIC + DM gates + flip-over)
SQL_GOLDEN_METHYLMIX_EM = """
SELECT CAST(event_type AS VARCHAR) AS event_type, CAST(n AS BIGINT) AS n, CAST(nr_components AS BIGINT) AS nr_components, CAST(comp AS BIGINT) AS comp, CAST(eta AS DOUBLE) AS eta, CAST(a AS DOUBLE) AS a, CAST(b AS DOUBLE) AS b, CAST(mu AS DOUBLE) AS mu, CAST(mixture_state AS DOUBLE) AS mixture_state, CAST(dm_pvalue AS DOUBLE) AS dm_pvalue, CAST(flipover_state AS BIGINT) AS flipover_state
FROM (VALUES
  ('click', 1714, 1, 1, 1.0, 0.901374, 7.831778, 0.103213, 0.0, 0.869684, 0),
  ('error', 1691, 1, 1, 1.0, 0.929658, 8.359912, 0.100075, 0.0, 0.297025, 0),
  ('purchase', 1703, 1, 1, 1.0, 0.921732, 8.463261, 0.098213, 0.0, 0.452106, 0),
  ('signup', 1731, 1, 1, 1.0, 0.926938, 8.126897, 0.102381, 0.0, 0.406489, 0),
  ('view', 1711, 1, 1, 1.0, 0.94895, 8.710873, 0.098237, 0.0, 0.253737, 0)
) AS t(event_type, n, nr_components, comp, eta, a, b, mu, mixture_state, dm_pvalue, flipover_state)
"""

# reference semantics: MethylMix/MethylMix.R:236-290 (ClusterProbes → profiles → mixture calls)
SQL_GOLDEN_PLAN_METHYLMIX = """
SELECT CAST(gene_cluster AS VARCHAR) AS gene_cluster, CAST(n AS BIGINT) AS n, CAST(nr_components AS BIGINT) AS nr_components, CAST(comp AS BIGINT) AS comp, CAST(eta AS DOUBLE) AS eta, CAST(a AS DOUBLE) AS a, CAST(b AS DOUBLE) AS b, CAST(mu AS DOUBLE) AS mu, CAST(mixture_state AS DOUBLE) AS mixture_state, CAST(dm_pvalue AS DOUBLE) AS dm_pvalue, CAST(flipover_state AS BIGINT) AS flipover_state
FROM (VALUES
  ('click__0', 20, 1, 1, 1.0, 42.804049, 366.034186, 0.104697, 0.0, 0.0476, 0),
  ('click__1', 20, 1, 1, 1.0, 16.676548, 156.646912, 0.096216, 0.0, 0.166805, 0),
  ('click__2', 20, 1, 1, 1.0, 18.587597, 160.421227, 0.103836, 0.0, 0.340785, 0),
  ('click__3', 20, 1, 1, 1.0, 26.888637, 234.166265, 0.103, 0.0, 0.601662, 0),
  ('error__0', 20, 1, 1, 1.0, 17.390719, 161.174198, 0.097392, 0.0, 0.134419, 0),
  ('error__1', 20, 1, 1, 1.0, 22.048704, 190.555974, 0.103708, 0.0, 0.529097, 0),
  ('error__2', 20, 1, 1, 1.0, 14.205028, 137.417882, 0.093687, 0.0, 0.620465, 0),
  ('error__3', 20, 1, 1, 1.0, 23.267784, 204.221976, 0.102281, 0.0, 0.989332, 0),
  ('purchase__0', 20, 1, 1, 1.0, 12.429678, 120.657425, 0.093395, 0.0, 0.149284, 0),
  ('purchase__1', 20, 1, 1, 1.0, 13.181025, 113.422044, 0.104113, 0.0, 0.010751, 0),
  ('purchase__2', 20, 1, 1, 1.0, 18.688647, 165.490721, 0.10147, 0.0, 0.085914, 0),
  ('purchase__3', 20, 1, 1, 1.0, 23.840397, 243.367787, 0.08922, 0.0, 0.444037, 0),
  ('signup__0', 20, 1, 1, 1.0, 22.140333, 206.806305, 0.096705, 0.0, 0.210964, 0),
  ('signup__1', 20, 1, 1, 1.0, 12.147251, 100.254972, 0.108069, 0.0, 0.295661, 0),
  ('signup__2', 20, 1, 1, 1.0, 23.529281, 206.404864, 0.102331, 0.0, 0.477691, 0),
  ('view__0', 20, 1, 1, 1.0, 19.493312, 189.550659, 0.09325, 0.0, 0.687015, 0),
  ('view__1', 20, 1, 1, 1.0, 30.437503, 272.79036, 0.100378, 0.0, 0.184131, 0),
  ('view__2', 20, 1, 1, 1.0, 28.496233, 259.039015, 0.099105, 0.0, 0.067501, 0),
  ('view__3', 20, 1, 1, 1.0, 15.086975, 139.915081, 0.097334, 0.0, 0.583114, 0)
) AS t(gene_cluster, n, nr_components, comp, eta, a, b, mu, mixture_state, dm_pvalue, flipover_state)
"""

# reference semantics: DriverNet/SignificanceTest.R:28-74 + ResultSummary.R:104-129
SQL_GOLDEN_DRIVERNET_SIGNIFICANCE = """
SELECT CAST(pick AS BIGINT) AS pick, CAST(mut_gene AS VARCHAR) AS mut_gene, CAST(covered AS BIGINT) AS covered, CAST(null_gt AS BIGINT) AS null_gt, CAST(n_null AS BIGINT) AS n_null, CAST(p_value AS DOUBLE) AS p_value
FROM (VALUES
  (1, 'Brand#2', 4380, 0, 73, 0.0),
  (2, 'Brand#4', 565, 17, 73, 0.232877),
  (3, 'Brand#19', 115, 26, 73, 0.356164),
  (4, 'Brand#16', 24, 43, 73, 0.589041),
  (5, 'Brand#1', 1, 71, 73, 0.972603)
) AS t(pick, mut_gene, covered, null_gt, n_null, p_value)
"""

# reference semantics: Robinson_method/R/run_ABCD-DNA.R:10-84 (edgeR glmFit/glmLRT, NB IRLS)
SQL_GOLDEN_K13_COUNT_GLM = """
SELECT CAST(p_brand AS VARCHAR) AS p_brand, CAST(coef AS VARCHAR) AS coef, CAST(estimate AS DOUBLE) AS estimate, CAST(se AS DOUBLE) AS se, CAST(z AS DOUBLE) AS z, CAST(lr AS DOUBLE) AS lr, CAST(pvalue AS DOUBLE) AS pvalue, CAST(z_lrt AS DOUBLE) AS z_lrt
FROM (VALUES
  ('Brand#1', 'intercept', -3.242499, 0.225647, -14.369784, NULL, NULL, NULL),
  ('Brand#1', 'l_linestatus=O', 0.02478, 0.319092, 0.077659, 0.006031, 0.9381, -0.077658),
  ('Brand#10', 'intercept', -3.275341, 0.225489, -14.525499, NULL, NULL, NULL),
  ('Brand#10', 'l_linestatus=O', 0.043346, 0.318934, 0.13591, 0.01847, 0.891897, -0.135905),
  ('Brand#11', 'intercept', -3.240353, 0.225745, -14.35407, NULL, NULL, NULL),
  ('Brand#11', 'l_linestatus=O', 0.001917, 0.319125, 0.006006, 3.6e-05, 0.995208, -0.006006),
  ('Brand#12', 'intercept', -3.25342, 0.225339, -14.4379, NULL, NULL, NULL),
  ('Brand#12', 'l_linestatus=O', 0.007378, 0.318724, 0.023149, 0.000536, 0.981531, -0.023149),
  ('Brand#13', 'intercept', -3.229217, 0.225856, -14.297652, NULL, NULL, NULL),
  ('Brand#13', 'l_linestatus=O', -0.017607, 0.319439, -0.055119, 0.003038, 0.956044, 0.055118),
  ('Brand#14', 'intercept', -3.240502, 0.225491, -14.370892, NULL, NULL, NULL),
  ('Brand#14', 'l_linestatus=O', 0.014889, 0.318845, 0.046697, 0.002181, 0.962754, -0.046697),
  ('Brand#15', 'intercept', -3.213951, 0.225455, -14.25541, NULL, NULL, NULL),
  ('Brand#15', 'l_linestatus=O', -0.022029, 0.318895, -0.06908, 0.004772, 0.944926, 0.06908),
  ('Brand#16', 'intercept', -3.243808, 0.225291, -14.398328, NULL, NULL, NULL),
  ('Brand#16', 'l_linestatus=O', 0.012775, 0.31856, 0.040101, 0.001608, 0.968013, -0.040101),
  ('Brand#17', 'intercept', -3.238184, 0.225259, -14.375349, NULL, NULL, NULL),
  ('Brand#17', 'l_linestatus=O', -0.010882, 0.318588, -0.034158, 0.001167, 0.972751, 0.034158),
  ('Brand#18', 'intercept', -3.240241, 0.225647, -14.359775, NULL, NULL, NULL),
  ('Brand#18', 'l_linestatus=O', 0.021401, 0.319087, 0.067069, 0.004498, 0.946527, -0.067069),
  ('Brand#19', 'intercept', -3.213863, 0.225189, -14.271829, NULL, NULL, NULL),
  ('Brand#19', 'l_linestatus=O', -0.009657, 0.318445, -0.030325, 0.00092, 0.975808, 0.030325),
  ('Brand#2', 'intercept', -3.229728, 0.225134, -14.345793, NULL, NULL, NULL),
  ('Brand#2', 'l_linestatus=O', -0.020409, 0.318401, -0.0641, 0.004109, 0.948891, 0.064099),
  ('Brand#20', 'intercept', -3.222957, 0.22552, -14.291247, NULL, NULL, NULL),
  ('Brand#20', 'l_linestatus=O', -0.010693, 0.318888, -0.033532, 0.001124, 0.97325, 0.033532),
  ('Brand#21', 'intercept', -3.200994, 0.225444, -14.19861, NULL, NULL, NULL),
  ('Brand#21', 'l_linestatus=O', -0.007021, 0.318816, -0.022022, 0.000485, 0.98243, 0.022022),
  ('Brand#22', 'intercept', -3.229707, 0.225513, -14.321594, NULL, NULL, NULL),
  ('Brand#22', 'l_linestatus=O', 0.006135, 0.318969, 0.019233, 0.00037, 0.984656, -0.019233),
  ('Brand#23', 'intercept', -3.251292, 0.225651, -14.408514, NULL, NULL, NULL),
  ('Brand#23', 'l_linestatus=O', -0.013654, 0.319059, -0.042794, 0.001831, 0.965866, 0.042793),
  ('Brand#24', 'intercept', -3.236763, 0.226019, -14.320753, NULL, NULL, NULL),
  ('Brand#24', 'l_linestatus=O', 0.007325, 0.319637, 0.022917, 0.000525, 0.981716, -0.022917),
  ('Brand#25', 'intercept', -3.257978, 0.225323, -14.459151, NULL, NULL, NULL),
  ('Brand#25', 'l_linestatus=O', 0.029197, 0.318644, 0.09163, 0.008396, 0.926994, -0.091628),
  ('Brand#3', 'intercept', -3.243144, 0.225354, -14.391345, NULL, NULL, NULL),
  ('Brand#3', 'l_linestatus=O', 0.01937, 0.318694, 0.060779, 0.003694, 0.951536, -0.060778),
  ('Brand#4', 'intercept', -3.250542, 0.225159, -14.436679, NULL, NULL, NULL),
  ('Brand#4', 'l_linestatus=O', 0.015911, 0.318456, 0.049964, 0.002496, 0.960151, -0.049964),
  ('Brand#5', 'intercept', -3.217407, 0.225701, -14.255204, NULL, NULL, NULL),
  ('Brand#5', 'l_linestatus=O', -0.002861, 0.31919, -0.008964, 8e-05, 0.992848, 0.008964),
  ('Brand#6', 'intercept', -3.276064, 0.226102, -14.489289, NULL, NULL, NULL),
  ('Brand#6', 'l_linestatus=O', 0.058886, 0.319747, 0.184165, 0.033912, 0.853894, -0.184152),
  ('Brand#7', 'intercept', -3.225055, 0.225513, -14.300966, NULL, NULL, NULL),
  ('Brand#7', 'l_linestatus=O', 0.00433, 0.318877, 0.013579, 0.000184, 0.989166, -0.013579),
  ('Brand#8', 'intercept', -3.233622, 0.225258, -14.355175, NULL, NULL, NULL),
  ('Brand#8', 'l_linestatus=O', -0.005417, 0.318602, -0.017001, 0.000289, 0.986435, 0.017001),
  ('Brand#9', 'intercept', -3.233471, 0.225327, -14.350137, NULL, NULL, NULL),
  ('Brand#9', 'l_linestatus=O', -0.004763, 0.318634, -0.014947, 0.000223, 0.988075, 0.014947)
) AS t(p_brand, coef, estimate, se, z, lr, pvalue, z_lrt)
"""

# reference semantics: TCGA GENERIC CheckBatchEffect, Download_Preprocess.R:828-848
SQL_GOLDEN_K10_PCA_BATCH = """
SELECT CAST(sample AS VARCHAR) AS sample, CAST(batch AS VARCHAR) AS batch, CAST(pc1 AS DOUBLE) AS pc1, CAST(f_stat AS DOUBLE) AS f_stat, CAST(p_value AS DOUBLE) AS p_value
FROM (VALUES
  ('0', '0', 7.262787, 0.108411, 0.897543),
  ('1', '1', -5.842029, 0.108411, 0.897543),
  ('10', '1', -5.333566, 0.108411, 0.897543),
  ('11', '2', -3.58715, 0.108411, 0.897543),
  ('12', '0', -3.745994, 0.108411, 0.897543),
  ('13', '1', 23.643701, 0.108411, 0.897543),
  ('14', '2', -17.432057, 0.108411, 0.897543),
  ('15', '0', 9.088767, 0.108411, 0.897543),
  ('16', '1', 0.400337, 0.108411, 0.897543),
  ('17', '2', -11.437685, 0.108411, 0.897543),
  ('18', '0', -4.778812, 0.108411, 0.897543),
  ('19', '1', -2.128389, 0.108411, 0.897543),
  ('2', '2', 5.65529, 0.108411, 0.897543),
  ('20', '2', -4.650126, 0.108411, 0.897543),
  ('21', '0', -12.039036, 0.108411, 0.897543),
  ('22', '1', -5.486373, 0.108411, 0.897543),
  ('23', '2', -4.23347, 0.108411, 0.897543),
  ('24', '0', 4.955942, 0.108411, 0.897543),
  ('25', '1', 3.269233, 0.108411, 0.897543),
  ('26', '2', 4.780056, 0.108411, 0.897543),
  ('27', '0', -9.745317, 0.108411, 0.897543),
  ('28', '1', 4.471272, 0.108411, 0.897543),
  ('29', '2', -1.480068, 0.108411, 0.897543),
  ('3', '0', -6.577625, 0.108411, 0.897543),
  ('30', '0', 14.707426, 0.108411, 0.897543),
  ('31', '1', 3.448985, 0.108411, 0.897543),
  ('32', '2', -5.84439, 0.108411, 0.897543),
  ('33', '0', 0.548403, 0.108411, 0.897543),
  ('34', '1', -2.392576, 0.108411, 0.897543),
  ('35', '2', -6.152716, 0.108411, 0.897543),
  ('36', '0', -2.411125, 0.108411, 0.897543),
  ('37', '1', 7.475332, 0.108411, 0.897543),
  ('38', '2', 6.725093, 0.108411, 0.897543),
  ('39', '0', -2.249205, 0.108411, 0.897543),
  ('4', '1', -7.745077, 0.108411, 0.897543),
  ('5', '2', -4.999052, 0.108411, 0.897543),
  ('6', '0', 9.389619, 0.108411, 0.897543),
  ('7', '1', -14.789073, 0.108411, 0.897543),
  ('8', '2', 31.340607, 0.108411, 0.897543),
  ('9', '0', 7.918061, 0.108411, 0.897543)
) AS t(sample, batch, pc1, f_stat, p_value)
"""

GOLDEN_ORACLES: dict[str, str] = {
    "methylmix_em": SQL_GOLDEN_METHYLMIX_EM,
    "plan_methylmix": SQL_GOLDEN_PLAN_METHYLMIX,
    "drivernet_significance": SQL_GOLDEN_DRIVERNET_SIGNIFICANCE,
    "k13_count_glm": SQL_GOLDEN_K13_COUNT_GLM,
    "k10_pca_batch": SQL_GOLDEN_K10_PCA_BATCH,
}


# ---- batch 2: remaining small seeded kernels (same determinism
# proof — bit-identical across independent sessions; the full-output
# methylmix_states and combat_adjust queries stay rows-only — 8.5k/10k
# rows — but batch 3 below value-locks both via aggregate digests) ----

# reference semantics: integrative_omics graph DAG-ification (gizmos.py cycle-break semantics)
SQL_GOLDEN_K14_DAG_BREAK = """
SELECT CAST(src AS VARCHAR) AS src, CAST(dst AS VARCHAR) AS dst, CAST(weight AS BIGINT) AS weight
FROM (VALUES
  ('0', '3', 519),
  ('1', '10', 544),
  ('13', '14', 480),
  ('14', '1', 465),
  ('15', '8', 488),
  ('19', '16', 459),
  ('2', '17', 539),
  ('3', '4', 490),
  ('4', '11', 477),
  ('5', '18', 552),
  ('6', '5', 543),
  ('7', '12', 548),
  ('8', '19', 548),
  ('9', '6', 587)
) AS t(src, dst, weight)
"""

# reference semantics: MethylMix ClusterProbes (MethylMix.R:236-290 probe clustering)
SQL_GOLDEN_K11_CLUSTER_PROBES = """
SELECT CAST(gene AS VARCHAR) AS gene, CAST(probe AS VARCHAR) AS probe, CAST(cluster AS BIGINT) AS cluster
FROM (VALUES
  ('0', 'click', 0),
  ('0', 'error', 1),
  ('0', 'purchase', 2),
  ('0', 'signup', 3),
  ('0', 'view', 4),
  ('1', 'click', 0),
  ('1', 'error', 1),
  ('1', 'purchase', 2),
  ('1', 'signup', 3),
  ('1', 'view', 4),
  ('2', 'click', 0),
  ('2', 'error', 1),
  ('2', 'purchase', 2),
  ('2', 'signup', 3),
  ('2', 'view', 4),
  ('3', 'click', 0),
  ('3', 'error', 1),
  ('3', 'purchase', 2),
  ('3', 'signup', 3),
  ('3', 'view', 4)
) AS t(gene, probe, cluster)
"""

# reference semantics: TCGA preprocess kNN imputation (Download_Preprocess.R impute path)
SQL_GOLDEN_K10_KNN_IMPUTE = """
SELECT CAST(block AS VARCHAR) AS block, CAST(row AS VARCHAR) AS row, CAST(col AS VARCHAR) AS col, CAST(v AS DOUBLE) AS v, CAST(imputed AS BOOLEAN) AS imputed
FROM (VALUES
  ('0', '0', 'click', 52.954545, FALSE),
  ('0', '0', 'error', 52.11087, FALSE),
  ('0', '0', 'purchase', 47.406522, FALSE),
  ('0', '0', 'signup', 49.751765, FALSE),
  ('0', '0', 'view', 38.139412, FALSE),
  ('0', '1', 'click', 43.72913, FALSE),
  ('0', '1', 'error', 51.949474, FALSE),
  ('0', '1', 'purchase', 42.579048, FALSE),
  ('0', '1', 'signup', 64.4388, FALSE),
  ('0', '1', 'view', 67.3324, FALSE),
  ('0', '10', 'click', 52.5125, FALSE),
  ('0', '10', 'error', 69.010857, FALSE),
  ('0', '10', 'purchase', 56.052593, FALSE),
  ('0', '10', 'signup', 61.143333, FALSE),
  ('0', '10', 'view', 50.714545, FALSE),
  ('0', '11', 'click', 59.148571, FALSE),
  ('0', '11', 'error', 37.533, FALSE),
  ('0', '11', 'purchase', 56.773182, FALSE),
  ('0', '11', 'signup', 44.435333, FALSE),
  ('0', '11', 'view', 55.862857, FALSE),
  ('0', '12', 'click', 29.38625, FALSE),
  ('0', '12', 'error', 43.077273, FALSE),
  ('0', '12', 'purchase', 46.270833, FALSE),
  ('0', '12', 'signup', 72.190667, FALSE),
  ('0', '12', 'view', 51.247692, FALSE),
  ('0', '13', 'click', 49.330952, FALSE),
  ('0', '13', 'error', 50.954667, FALSE),
  ('0', '13', 'purchase', 62.2925, FALSE),
  ('0', '13', 'signup', 49.331154, FALSE),
  ('0', '13', 'view', 48.684138, FALSE),
  ('0', '14', 'click', 59.222857, FALSE),
  ('0', '14', 'error', 54.4645, FALSE),
  ('0', '14', 'purchase', 34.562941, FALSE),
  ('0', '14', 'signup', 65.7, FALSE),
  ('0', '14', 'view', 52.509286, FALSE),
  ('0', '15', 'click', 57.647059, FALSE),
  ('0', '15', 'error', 64.331481, FALSE),
  ('0', '15', 'purchase', 51.388929, FALSE),
  ('0', '15', 'signup', 59.531579, FALSE),
  ('0', '15', 'view', 33.983929, FALSE),
  ('0', '16', 'click', 50.6175, FALSE),
  ('0', '16', 'error', 60.24, FALSE),
  ('0', '16', 'purchase', 58.968571, FALSE),
  ('0', '16', 'signup', 64.48875, FALSE),
  ('0', '16', 'view', 41.152703, FALSE),
  ('0', '2', 'click', 52.985, FALSE),
  ('0', '2', 'error', 43.776, FALSE),
  ('0', '2', 'purchase', 61.702857, FALSE),
  ('0', '2', 'signup', 45.6375, FALSE),
  ('0', '2', 'view', 65.343333, FALSE),
  ('0', '3', 'click', 74.371515, FALSE),
  ('0', '3', 'error', 60.591905, FALSE),
  ('0', '3', 'purchase', 53.447, FALSE),
  ('0', '3', 'signup', 52.404286, FALSE),
  ('0', '3', 'view', 61.604074, FALSE),
  ('0', '4', 'click', 55.130714, FALSE),
  ('0', '4', 'error', 51.96, FALSE),
  ('0', '4', 'purchase', 55.68, FALSE),
  ('0', '4', 'signup', 51.169048, FALSE),
  ('0', '4', 'view', 45.907037, FALSE),
  ('0', '5', 'click', 39.211786, FALSE),
  ('0', '5', 'error', 51.14, FALSE),
  ('0', '5', 'purchase', 54.243704, FALSE),
  ('0', '5', 'signup', 60.437619, FALSE),
  ('0', '5', 'view', 53.738846, FALSE),
  ('0', '6', 'click', 63.8052, FALSE),
  ('0', '6', 'error', 46.954444, FALSE),
  ('0', '6', 'purchase', 43.5528, FALSE),
  ('0', '6', 'signup', 57.290385, FALSE),
  ('0', '6', 'view', 55.377727, FALSE),
  ('0', '7', 'click', 39.716875, FALSE),
  ('0', '7', 'error', 73.050588, FALSE),
  ('0', '7', 'purchase', 52.664667, FALSE),
  ('0', '7', 'signup', 57.435, FALSE),
  ('0', '7', 'view', 56.662, FALSE),
  ('0', '8', 'click', 66.75125, FALSE),
  ('0', '8', 'error', 45.465769, FALSE),
  ('0', '8', 'purchase', 60.461923, FALSE),
  ('0', '8', 'signup', 79.1452, FALSE),
  ('0', '8', 'view', 51.982381, FALSE),
  ('0', '9', 'click', 54.989583, FALSE),
  ('0', '9', 'error', 55.711538, FALSE),
  ('0', '9', 'purchase', 52.643, FALSE),
  ('0', '9', 'signup', 50.950313, FALSE),
  ('0', '9', 'view', 62.482381, FALSE),
  ('1', '0', 'click', 51.152609, FALSE),
  ('1', '0', 'error', 57.697273, FALSE),
  ('1', '0', 'purchase', 47.2025, FALSE),
  ('1', '0', 'signup', 48.725833, FALSE),
  ('1', '0', 'view', 54.155294, FALSE),
  ('1', '1', 'click', 64.511538, FALSE),
  ('1', '1', 'error', 51.584444, FALSE),
  ('1', '1', 'purchase', 64.604375, FALSE),
  ('1', '1', 'signup', 51.7888, FALSE),
  ('1', '1', 'view', 58.415882, FALSE),
  ('1', '10', 'click', 51.294, FALSE),
  ('1', '10', 'error', 55.555769, FALSE),
  ('1', '10', 'purchase', 42.36, FALSE),
  ('1', '10', 'signup', 41.015, FALSE),
  ('1', '10', 'view', 53.447308, FALSE),
  ('1', '11', 'click', 57.7785, FALSE),
  ('1', '11', 'error', 38.693636, FALSE),
  ('1', '11', 'purchase', 54.873793, FALSE),
  ('1', '11', 'signup', 67.3792, FALSE),
  ('1', '11', 'view', 58.786563, FALSE),
  ('1', '12', 'click', 57.473448, FALSE),
  ('1', '12', 'error', 45.277308, FALSE),
  ('1', '12', 'purchase', 57.448261, FALSE),
  ('1', '12', 'signup', 50.995909, FALSE),
  ('1', '12', 'view', 60.112105, FALSE),
  ('1', '13', 'click', 57.575625, FALSE),
  ('1', '13', 'error', 63.341818, FALSE),
  ('1', '13', 'purchase', 38.160833, FALSE),
  ('1', '13', 'signup', 52.451875, FALSE),
  ('1', '13', 'view', 53.844706, FALSE),
  ('1', '14', 'click', 55.343077, FALSE),
  ('1', '14', 'error', 54.983438, FALSE),
  ('1', '14', 'purchase', 54.425625, FALSE),
  ('1', '14', 'signup', 50.8648, FALSE),
  ('1', '14', 'view', 44.151923, FALSE),
  ('1', '15', 'click', 39.533, FALSE),
  ('1', '15', 'error', 49.845, FALSE),
  ('1', '15', 'purchase', 55.914545, FALSE),
  ('1', '15', 'signup', 49.478571, FALSE),
  ('1', '15', 'view', 62.204545, FALSE),
  ('1', '16', 'click', 69.6025, FALSE),
  ('1', '16', 'error', 46.917273, FALSE),
  ('1', '16', 'purchase', 53.49037, FALSE),
  ('1', '16', 'signup', 52.148182, FALSE),
  ('1', '16', 'view', 45.8052, FALSE),
  ('1', '2', 'click', 53.348421, FALSE),
  ('1', '2', 'error', 52.009545, FALSE),
  ('1', '2', 'purchase', 51.028696, FALSE),
  ('1', '2', 'signup', 46.414231, FALSE),
  ('1', '2', 'view', 57.447917, FALSE),
  ('1', '3', 'click', 57.058889, FALSE),
  ('1', '3', 'error', 53.22, FALSE),
  ('1', '3', 'purchase', 58.710769, FALSE),
  ('1', '3', 'signup', 79.042, FALSE),
  ('1', '3', 'view', 79.672, FALSE),
  ('1', '4', 'click', 49.484091, FALSE),
  ('1', '4', 'error', 51.251481, FALSE),
  ('1', '4', 'purchase', 54.698, FALSE),
  ('1', '4', 'signup', 50.119706, FALSE),
  ('1', '4', 'view', 37.231935, FALSE),
  ('1', '5', 'click', 51.435238, FALSE),
  ('1', '5', 'error', 48.565185, FALSE),
  ('1', '5', 'purchase', 69.576154, FALSE),
  ('1', '5', 'signup', 37.712941, FALSE),
  ('1', '5', 'view', 56.834444, FALSE),
  ('1', '6', 'click', 52.057895, FALSE),
  ('1', '6', 'error', 55.964545, FALSE),
  ('1', '6', 'purchase', 52.338095, FALSE),
  ('1', '6', 'signup', 52.352941, FALSE),
  ('1', '6', 'view', 43.997308, FALSE),
  ('1', '7', 'click', 52.825, FALSE),
  ('1', '7', 'error', 44.6285, FALSE),
  ('1', '7', 'purchase', 60.778333, FALSE),
  ('1', '7', 'signup', 68.916774, FALSE),
  ('1', '7', 'view', 70.106923, FALSE),
  ('1', '8', 'click', 57.5575, FALSE),
  ('1', '8', 'error', 77.823333, FALSE),
  ('1', '8', 'purchase', 41.265455, FALSE),
  ('1', '8', 'signup', 72.816, FALSE),
  ('1', '8', 'view', 45.253636, FALSE),
  ('1', '9', 'click', 53.354091, FALSE),
  ('1', '9', 'error', 64.3875, FALSE),
  ('1', '9', 'purchase', 58.92125, FALSE),
  ('1', '9', 'signup', 64.680741, FALSE),
  ('1', '9', 'view', 55.113529, FALSE),
  ('2', '0', 'click', 42.164167, FALSE),
  ('2', '0', 'error', 51.631667, FALSE),
  ('2', '0', 'purchase', 35.994375, FALSE),
  ('2', '0', 'signup', 38.3075, FALSE),
  ('2', '0', 'view', 71.315, FALSE),
  ('2', '1', 'click', 51.025769, FALSE),
  ('2', '1', 'error', 41.016667, FALSE),
  ('2', '1', 'purchase', 63.788519, FALSE),
  ('2', '1', 'signup', 47.179524, FALSE),
  ('2', '1', 'view', 49.973333, FALSE),
  ('2', '10', 'click', 63.311111, FALSE),
  ('2', '10', 'error', 65.630588, FALSE),
  ('2', '10', 'purchase', 57.466316, FALSE),
  ('2', '10', 'signup', 36.947857, FALSE),
  ('2', '10', 'view', 53.78, FALSE),
  ('2', '11', 'click', 57.346316, FALSE),
  ('2', '11', 'error', 53.934211, FALSE),
  ('2', '11', 'purchase', 49.377857, FALSE),
  ('2', '11', 'signup', 64.511481, FALSE),
  ('2', '11', 'view', 38.26625, FALSE),
  ('2', '12', 'click', 39.85875, FALSE),
  ('2', '12', 'error', 54.287826, FALSE),
  ('2', '12', 'purchase', 45.9372, FALSE),
  ('2', '12', 'signup', 55.419565, FALSE),
  ('2', '12', 'view', 73.681034, FALSE),
  ('2', '13', 'click', 64.134643, FALSE),
  ('2', '13', 'error', 47.474194, FALSE),
  ('2', '13', 'purchase', 54.303226, FALSE),
  ('2', '13', 'signup', 41.917083, FALSE),
  ('2', '13', 'view', 54.859643, FALSE),
  ('2', '14', 'click', 40.323636, FALSE),
  ('2', '14', 'error', 68.620909, FALSE),
  ('2', '14', 'purchase', 38.285385, FALSE),
  ('2', '14', 'signup', 62.396667, FALSE),
  ('2', '14', 'view', 75.349, FALSE),
  ('2', '15', 'click', 46.167941, FALSE),
  ('2', '15', 'error', 52.5, FALSE),
  ('2', '15', 'purchase', 52.797, FALSE),
  ('2', '15', 'signup', 69.15625, FALSE),
  ('2', '15', 'view', 52.571818, FALSE),
  ('2', '16', 'click', 56.3125, FALSE),
  ('2', '16', 'error', 45.49625, FALSE),
  ('2', '16', 'purchase', 48.992, FALSE),
  ('2', '16', 'signup', 55.174286, FALSE),
  ('2', '16', 'view', 37.718, FALSE),
  ('2', '2', 'click', 39.939231, FALSE),
  ('2', '2', 'error', 55.258, FALSE),
  ('2', '2', 'purchase', 60.22, FALSE),
  ('2', '2', 'signup', 68.692222, FALSE),
  ('2', '2', 'view', 51.14963, FALSE),
  ('2', '3', 'click', 64.737143, FALSE),
  ('2', '3', 'error', 59.947895, FALSE),
  ('2', '3', 'purchase', 39.925, FALSE),
  ('2', '3', 'signup', 56.741714, FALSE),
  ('2', '3', 'view', 41.13875, FALSE),
  ('2', '4', 'click', 57.916154, FALSE),
  ('2', '4', 'error', 37.456154, FALSE),
  ('2', '4', 'purchase', 54.575, FALSE),
  ('2', '4', 'signup', 52.635714, FALSE),
  ('2', '4', 'view', 60.499167, FALSE),
  ('2', '5', 'click', 48.46625, FALSE),
  ('2', '5', 'error', 59.78, FALSE),
  ('2', '5', 'purchase', 40.32125, FALSE),
  ('2', '5', 'signup', 29.037, FALSE),
  ('2', '5', 'view', 49.428929, FALSE),
  ('2', '6', 'click', 43.753913, FALSE),
  ('2', '6', 'error', 56.296471, FALSE),
  ('2', '6', 'purchase', 62.116786, FALSE),
  ('2', '6', 'signup', 56.115238, FALSE),
  ('2', '6', 'view', 45.282609, FALSE),
  ('2', '7', 'click', 65.020968, FALSE),
  ('2', '7', 'error', 67.295161, FALSE),
  ('2', '7', 'purchase', 53.882857, FALSE),
  ('2', '7', 'signup', 45.840741, FALSE),
  ('2', '7', 'view', 35.284138, FALSE),
  ('2', '8', 'click', 56.379231, FALSE),
  ('2', '8', 'error', 56.241429, FALSE),
  ('2', '8', 'purchase', 58.136, FALSE),
  ('2', '8', 'signup', 44.8388, FALSE),
  ('2', '8', 'view', 51.834762, FALSE),
  ('2', '9', 'click', 62.74, FALSE),
  ('2', '9', 'error', 41.469412, FALSE),
  ('2', '9', 'purchase', 45.506667, FALSE),
  ('2', '9', 'signup', 47.39, FALSE),
  ('2', '9', 'view', 63.706667, FALSE),
  ('3', '0', 'click', 62.183889, FALSE),
  ('3', '0', 'error', 42.707778, FALSE),
  ('3', '0', 'purchase', 40.55, FALSE),
  ('3', '0', 'signup', 39.7125, FALSE),
  ('3', '0', 'view', 41.226154, FALSE),
  ('3', '1', 'click', 49.378421, FALSE),
  ('3', '1', 'error', 71.373667, FALSE),
  ('3', '1', 'purchase', 50.947308, FALSE),
  ('3', '1', 'signup', 50.930435, FALSE),
  ('3', '1', 'view', 64.409375, FALSE),
  ('3', '10', 'click', 64.375, FALSE),
  ('3', '10', 'error', 55.751429, FALSE),
  ('3', '10', 'purchase', 70.47625, FALSE),
  ('3', '10', 'signup', 74.403333, FALSE),
  ('3', '10', 'view', 72.594, FALSE),
  ('3', '11', 'click', 61.336364, FALSE),
  ('3', '11', 'error', 66.052727, FALSE),
  ('3', '11', 'purchase', 44.555, FALSE),
  ('3', '11', 'signup', 61.48, FALSE),
  ('3', '11', 'view', 55.631875, FALSE),
  ('3', '12', 'click', 48.6204, FALSE),
  ('3', '12', 'error', 62.2375, FALSE),
  ('3', '12', 'purchase', 57.35381, FALSE),
  ('3', '12', 'signup', 67.957826, FALSE),
  ('3', '12', 'view', 60.4275, FALSE),
  ('3', '13', 'click', 45.50375, FALSE),
  ('3', '13', 'error', 51.191034, FALSE),
  ('3', '13', 'purchase', 37.305625, FALSE),
  ('3', '13', 'signup', 70.895185, FALSE),
  ('3', '13', 'view', 52.897, FALSE),
  ('3', '14', 'click', 63.539615, FALSE),
  ('3', '14', 'error', 75.4845, FALSE),
  ('3', '14', 'purchase', 40.555455, FALSE),
  ('3', '14', 'signup', 73.672174, FALSE),
  ('3', '14', 'view', 46.738333, FALSE),
  ('3', '15', 'click', 68.56, FALSE),
  ('3', '15', 'error', 66.926667, FALSE),
  ('3', '15', 'purchase', 59.15, FALSE),
  ('3', '15', 'signup', 52.35, FALSE),
  ('3', '15', 'view', 37.789, FALSE),
  ('3', '16', 'click', 62.934783, FALSE),
  ('3', '16', 'error', 46.148182, FALSE),
  ('3', '16', 'purchase', 55.499615, FALSE),
  ('3', '16', 'signup', 54.721364, FALSE),
  ('3', '16', 'view', 37.678148, FALSE),
  ('3', '2', 'click', 46.311364, FALSE),
  ('3', '2', 'error', 56.622414, FALSE),
  ('3', '2', 'purchase', 46.150435, FALSE),
  ('3', '2', 'signup', 64.722381, FALSE),
  ('3', '2', 'view', 71.5732, FALSE),
  ('3', '3', 'click', 64.321176, FALSE),
  ('3', '3', 'error', 59.059333, FALSE),
  ('3', '3', 'purchase', 64.700882, FALSE),
  ('3', '3', 'signup', 58.290435, FALSE),
  ('3', '3', 'view', 60.627143, FALSE),
  ('3', '4', 'click', 57.938182, FALSE),
  ('3', '4', 'error', 55.1125, FALSE),
  ('3', '4', 'purchase', 57.829048, FALSE),
  ('3', '4', 'signup', 31.751429, FALSE),
  ('3', '4', 'view', 42.687273, FALSE),
  ('3', '5', 'click', 59.595455, FALSE),
  ('3', '5', 'error', 74.705, FALSE),
  ('3', '5', 'purchase', 63.753889, FALSE),
  ('3', '5', 'signup', 55.066471, FALSE),
  ('3', '5', 'view', 49.655, FALSE),
  ('3', '6', 'click', 61.061818, FALSE),
  ('3', '6', 'error', 49.334348, FALSE),
  ('3', '6', 'purchase', 59.929524, FALSE),
  ('3', '6', 'signup', 56.11, FALSE),
  ('3', '6', 'view', 43.451875, FALSE),
  ('3', '7', 'click', 50.634815, FALSE),
  ('3', '7', 'error', 42.112963, FALSE),
  ('3', '7', 'purchase', 55.978667, FALSE),
  ('3', '7', 'signup', 56.991667, FALSE),
  ('3', '7', 'view', 58.802174, FALSE),
  ('3', '8', 'click', 70.954839, FALSE),
  ('3', '8', 'error', 53.13027, FALSE),
  ('3', '8', 'purchase', 58.705238, FALSE),
  ('3', '8', 'signup', 76.765625, FALSE),
  ('3', '8', 'view', 52.10619, FALSE),
  ('3', '9', 'click', 70.008649, FALSE),
  ('3', '9', 'error', 68.133793, FALSE),
  ('3', '9', 'purchase', 48.351818, FALSE),
  ('3', '9', 'signup', 73.305417, FALSE),
  ('3', '9', 'view', 68.687857, FALSE),
  ('4', '0', 'click', 96.109474, FALSE),
  ('4', '0', 'error', 51.971818, FALSE),
  ('4', '0', 'purchase', 48.860385, FALSE),
  ('4', '0', 'signup', 49.603889, FALSE),
  ('4', '0', 'view', 59.264074, FALSE),
  ('4', '1', 'click', 53.953077, FALSE),
  ('4', '1', 'error', 54.154, FALSE),
  ('4', '1', 'purchase', 56.478333, FALSE),
  ('4', '1', 'signup', 48.516, FALSE),
  ('4', '1', 'view', 62.74375, FALSE),
  ('4', '10', 'click', 49.408421, FALSE),
  ('4', '10', 'error', 39.398125, FALSE),
  ('4', '10', 'purchase', 61.727, FALSE),
  ('4', '10', 'signup', 52.914615, FALSE),
  ('4', '10', 'view', 54.783846, FALSE),
  ('4', '11', 'click', 47.957273, FALSE),
  ('4', '11', 'error', 61.377273, FALSE),
  ('4', '11', 'purchase', 57.605, FALSE),
  ('4', '11', 'signup', 54.606429, FALSE),
  ('4', '11', 'view', 58.158571, FALSE),
  ('4', '12', 'click', 43.74913, FALSE),
  ('4', '12', 'error', 39.201481, FALSE),
  ('4', '12', 'purchase', 63.962941, FALSE),
  ('4', '12', 'signup', 54.866087, FALSE),
  ('4', '12', 'view', 55.508889, FALSE),
  ('4', '13', 'click', 69.236923, FALSE),
  ('4', '13', 'error', 51.354333, FALSE),
  ('4', '13', 'purchase', 54.446429, FALSE),
  ('4', '13', 'signup', 53.818462, FALSE),
  ('4', '13', 'view', 64.274, FALSE),
  ('4', '14', 'click', 55.977619, FALSE),
  ('4', '14', 'error', 75.437826, FALSE),
  ('4', '14', 'purchase', 44.7828, FALSE),
  ('4', '14', 'signup', 52.2545, FALSE),
  ('4', '14', 'view', 63.202941, FALSE),
  ('4', '15', 'click', 59.931471, FALSE),
  ('4', '15', 'error', 44.300323, FALSE),
  ('4', '15', 'purchase', 51.552273, FALSE),
  ('4', '15', 'signup', 62.758214, FALSE),
  ('4', '15', 'view', 56.77, FALSE),
  ('4', '16', 'click', 55.02, FALSE),
  ('4', '16', 'error', 53.9765, FALSE),
  ('4', '16', 'purchase', 115.068571, FALSE),
  ('4', '16', 'signup', 64.5225, FALSE),
  ('4', '16', 'view', 58.131111, FALSE),
  ('4', '2', 'click', 58.005882, FALSE),
  ('4', '2', 'error', 53.699167, FALSE),
  ('4', '2', 'purchase', 43.533448, FALSE),
  ('4', '2', 'signup', 62.622083, FALSE),
  ('4', '2', 'view', 46.026522, FALSE),
  ('4', '3', 'click', 40.0832, FALSE),
  ('4', '3', 'error', 71.581818, FALSE),
  ('4', '3', 'purchase', 52.0892, FALSE),
  ('4', '3', 'signup', 41.704483, FALSE),
  ('4', '3', 'view', 39.357143, FALSE),
  ('4', '4', 'click', 56.411667, FALSE),
  ('4', '4', 'error', 67.243478, FALSE),
  ('4', '4', 'purchase', 61.273182, FALSE),
  ('4', '4', 'signup', 58.731212, FALSE),
  ('4', '4', 'view', 51.81, FALSE),
  ('4', '5', 'click', 70.652963, FALSE),
  ('4', '5', 'error', 48.122174, FALSE),
  ('4', '5', 'purchase', 43.904, FALSE),
  ('4', '5', 'signup', 41.69, FALSE),
  ('4', '5', 'view', 49.57619, FALSE),
  ('4', '6', 'click', 48.0, FALSE),
  ('4', '6', 'error', 71.44, FALSE),
  ('4', '6', 'purchase', 47.883077, FALSE),
  ('4', '6', 'signup', 66.915714, FALSE),
  ('4', '6', 'view', 63.053, FALSE),
  ('4', '7', 'click', 53.935789, FALSE),
  ('4', '7', 'error', 77.9055, FALSE),
  ('4', '7', 'purchase', 47.055238, FALSE),
  ('4', '7', 'signup', 59.091304, FALSE),
  ('4', '7', 'view', 54.920435, FALSE),
  ('4', '8', 'click', 55.93, FALSE),
  ('4', '8', 'error', 59.521667, FALSE),
  ('4', '8', 'purchase', 42.480357, FALSE),
  ('4', '8', 'signup', 51.653684, FALSE),
  ('4', '8', 'view', 42.204211, FALSE),
  ('4', '9', 'click', 55.735, FALSE),
  ('4', '9', 'error', 69.937333, FALSE),
  ('4', '9', 'purchase', 50.245385, FALSE),
  ('4', '9', 'signup', 41.272069, FALSE),
  ('4', '9', 'view', 42.493462, FALSE)
) AS t(block, row, col, v, imputed)
"""

# reference semantics: partial-correlation screen (corrMultiomics.py partial corr)
SQL_GOLDEN_K12_PARTIAL_CORR = """
SELECT CAST(block AS VARCHAR) AS block, CAST(var_a AS VARCHAR) AS var_a, CAST(var_b AS VARCHAR) AS var_b, CAST(pcor AS DOUBLE) AS pcor
FROM (VALUES
  ('0', 'click', 'error', 0.097641),
  ('0', 'click', 'purchase', -0.050524),
  ('0', 'click', 'signup', 0.013931),
  ('0', 'click', 'view', -0.163714),
  ('0', 'error', 'purchase', 0.11513),
  ('0', 'error', 'signup', 0.251546),
  ('0', 'error', 'view', -0.038729),
  ('0', 'purchase', 'signup', 0.214323),
  ('0', 'purchase', 'view', -0.252822),
  ('0', 'signup', 'view', 0.150451),
  ('1', 'click', 'error', -0.10739),
  ('1', 'click', 'purchase', -0.158189),
  ('1', 'click', 'signup', 0.053471),
  ('1', 'click', 'view', -0.042372),
  ('1', 'error', 'purchase', -0.279355),
  ('1', 'error', 'signup', -0.01914),
  ('1', 'error', 'view', -0.097546),
  ('1', 'purchase', 'signup', -0.206617),
  ('1', 'purchase', 'view', -0.289961),
  ('1', 'signup', 'view', 0.114138),
  ('2', 'click', 'error', -0.17458),
  ('2', 'click', 'purchase', 0.268724),
  ('2', 'click', 'signup', -0.131036),
  ('2', 'click', 'view', 0.01207),
  ('2', 'error', 'purchase', -0.189617),
  ('2', 'error', 'signup', 0.12748),
  ('2', 'error', 'view', -0.218301),
  ('2', 'purchase', 'signup', 0.257842),
  ('2', 'purchase', 'view', -0.125857),
  ('2', 'signup', 'view', 0.279929),
  ('3', 'click', 'error', 0.283605),
  ('3', 'click', 'purchase', -0.183213),
  ('3', 'click', 'signup', 0.082779),
  ('3', 'click', 'view', 0.02711),
  ('3', 'error', 'purchase', 0.003654),
  ('3', 'error', 'signup', 0.001302),
  ('3', 'error', 'view', 0.248254),
  ('3', 'purchase', 'signup', 0.210125),
  ('3', 'purchase', 'view', 0.098739),
  ('3', 'signup', 'view', 0.075953)
) AS t(block, var_a, var_b, pcor)
"""

# reference semantics: DriverNet/SignificanceTest.R:28-74 permutation null coverage
SQL_GOLDEN_DRIVERNET_PERMUTATION = """
SELECT CAST(run_id AS BIGINT) AS run_id, CAST(rank AS BIGINT) AS rank, CAST(coverage AS BIGINT) AS coverage
FROM (VALUES
  (0, 1, 1459),
  (0, 2, 203),
  (0, 3, 31),
  (0, 4, 7),
  (2, 1, 1495),
  (2, 2, 187),
  (2, 3, 34),
  (2, 4, 8),
  (3, 1, 1432),
  (3, 2, 185),
  (3, 3, 39),
  (3, 4, 5),
  (4, 1, 716),
  (4, 2, 91),
  (4, 3, 18),
  (4, 4, 2),
  (5, 1, 716),
  (5, 2, 95),
  (5, 3, 19),
  (5, 4, 4),
  (6, 1, 779),
  (6, 2, 98),
  (6, 3, 17),
  (6, 4, 3),
  (7, 1, 1459),
  (7, 2, 203),
  (7, 3, 31),
  (7, 4, 7),
  (8, 1, 2169),
  (8, 2, 287),
  (8, 3, 58),
  (8, 4, 11),
  (8, 5, 2),
  (8, 6, 1),
  (9, 1, 697),
  (9, 2, 101),
  (9, 3, 19),
  (9, 4, 4),
  (10, 1, 779),
  (10, 2, 98),
  (10, 3, 17),
  (10, 4, 3),
  (11, 1, 1409),
  (11, 2, 204),
  (11, 3, 34),
  (11, 4, 8),
  (12, 1, 1413),
  (12, 2, 195),
  (12, 3, 40),
  (12, 4, 7),
  (13, 1, 1444),
  (13, 2, 197),
  (13, 3, 38),
  (13, 4, 7),
  (13, 5, 1),
  (14, 1, 697),
  (14, 2, 101),
  (14, 3, 20),
  (14, 4, 3),
  (15, 1, 1446),
  (15, 2, 178),
  (15, 3, 37),
  (15, 4, 5),
  (15, 5, 2),
  (17, 1, 697),
  (17, 2, 101),
  (17, 3, 19),
  (17, 4, 4),
  (18, 1, 702),
  (18, 2, 110),
  (18, 3, 23),
  (18, 4, 4),
  (18, 5, 2)
) AS t(run_id, rank, coverage)
"""

GOLDEN_ORACLES.update({
    "k14_dag_break": SQL_GOLDEN_K14_DAG_BREAK,
    "k11_cluster_probes": SQL_GOLDEN_K11_CLUSTER_PROBES,
    "k10_knn_impute": SQL_GOLDEN_K10_KNN_IMPUTE,
    "k12_partial_corr": SQL_GOLDEN_K12_PARTIAL_CORR,
    "drivernet_permutation": SQL_GOLDEN_DRIVERNET_PERMUTATION,
})


# ---- batch 3 (r7): aggregate-DIGEST goldens for the two kernels whose
# full output is too large to pin as a VALUES literal (methylmix_states
# 8.5k rows, combat_adjust 10k rows).  The registered digest queries
# reduce each output to per-group (count, rounded checksums); a change
# in ANY single row of the underlying matrix moves a checksum, so the
# driver's hash compare now value-locks both kernels with <=15 literal
# rows each.  Same determinism proof as the other pins: bit-identical
# across independent SparkSessions (tests/test_golden_oracles.py), and
# the underlying kernels carry independent replica evidence (MethylMix
# sample-level golden parity in tests/test_kernels.py; ComBat's
# closed-form sibling combat_mean_only is hash-checked against a real
# SQL oracle in-window).  Scale-bound to sf0.01 inputs. ----

# reference semantics: MethylMix/MethylMix.R:405-419 (MethylationStates matrix)
SQL_GOLDEN_METHYLMIX_STATES_DIGEST = """
SELECT CAST(event_type AS VARCHAR) AS event_type, CAST(classification AS BIGINT) AS classification,
       CAST(n AS BIGINT) AS n, CAST(value_sum AS DOUBLE) AS value_sum,
       CAST(state_sum AS DOUBLE) AS state_sum, CAST(id_sum AS DOUBLE) AS id_sum
FROM (VALUES
  ('click', 1, 1714, 173.8626, -2.4647, 8510360.0),
  ('error', 1, 1691, 167.862, 0.0693, 8392830.0),
  ('purchase', 1, 1703, 165.5786, 10.3917, 8437682.0),
  ('signup', 1, 1731, 175.508, -7.6043, 8704458.0),
  ('view', 1, 1711, 167.2172, 9.958, 8692356.0)
) AS t(event_type, classification, n, value_sum, state_sum, id_sum)
"""

# reference semantics: MethylMix/ComBat_NoFiles.R:30-297 (EB batch adjust)
SQL_GOLDEN_COMBAT_ADJUST_DIGEST = """
SELECT CAST(feature AS VARCHAR) AS feature, CAST(batch AS VARCHAR) AS batch,
       CAST(n AS BIGINT) AS n, CAST(adjusted_sum AS DOUBLE) AS adjusted_sum,
       CAST(raw_sum AS DOUBLE) AS raw_sum
FROM (VALUES
  ('click', '0', 675, 33913.542, 33804.14),
  ('click', '1', 654, 33803.538, 33885.99),
  ('click', '2', 677, 34164.208, 34260.87),
  ('error', '0', 660, 32113.978, 31938.55),
  ('error', '1', 658, 33412.398, 33582.13),
  ('error', '2', 696, 34330.643, 34435.45),
  ('purchase', '0', 658, 32182.211, 32327.35),
  ('purchase', '1', 651, 31118.914, 30901.3),
  ('purchase', '2', 672, 32134.594, 32227.12),
  ('signup', '0', 692, 35014.009, 34935.46),
  ('signup', '1', 661, 33437.696, 33199.46),
  ('signup', '2', 664, 34542.597, 34746.21),
  ('view', '0', 669, 33158.575, 33404.53),
  ('view', '1', 647, 30625.01, 30236.85),
  ('view', '2', 666, 32302.61, 32421.16)
) AS t(feature, batch, n, adjusted_sum, raw_sum)
"""

GOLDEN_ORACLES.update({
    "methylmix_states_digest": SQL_GOLDEN_METHYLMIX_STATES_DIGEST,
    "combat_adjust_digest": SQL_GOLDEN_COMBAT_ADJUST_DIGEST,
})


# reference semantics: integrative_omics/wcModules.py:219-227 (ClusterOne jar
# over the S10 edge file — here the native cohesiveness greedy, which
# recovers exactly the three planted K4 modules of the query's graph)
SQL_GOLDEN_CLUSTERONE_MODULES = """
SELECT CAST(cluster_id AS BIGINT) AS cluster_id, CAST(member AS VARCHAR) AS member,
       CAST(size AS BIGINT) AS size, CAST(density AS DOUBLE) AS density,
       CAST(cohesiveness AS DOUBLE) AS cohesiveness
FROM (VALUES
  (0, '4', 4, 1.0, 0.726665),
  (0, '5', 4, 1.0, 0.726665),
  (0, '6', 4, 1.0, 0.726665),
  (0, '7', 4, 1.0, 0.726665),
  (1, '0', 4, 1.0, 0.726086),
  (1, '1', 4, 1.0, 0.726086),
  (1, '2', 4, 1.0, 0.726086),
  (1, '3', 4, 1.0, 0.726086),
  (2, '10', 4, 1.0, 0.706179),
  (2, '11', 4, 1.0, 0.706179),
  (2, '8', 4, 1.0, 0.706179),
  (2, '9', 4, 1.0, 0.706179)
) AS t(cluster_id, member, size, density, cohesiveness)
"""

GOLDEN_ORACLES.update({
    "clusterone_modules": SQL_GOLDEN_CLUSTERONE_MODULES,
    # r9: the SAME pin also locks the ego-delivery strategy (integer
    # count weights → exact sums → bit-identical by construction)
    "clusterone_modules_ego": SQL_GOLDEN_CLUSTERONE_MODULES,
})


# ---- batch 4 (r7): SemDeDup digest.  The within-cluster greedy (keep
# the lowest-id member of every cosine>=t group) is order-sequential, so
# no ANSI-SQL oracle exists; the registered query runs the EXACT
# operating point (n_lists=1 — quantizer-independent) and reduces the
# 500-row keep/drop verdict to a per-verdict digest.  id_sum moves on
# any single keep-flip.  Independent no-Spark replica:
# tests/test_golden_replicas.py re-derives this digest with numpy only.
# reference semantics: SemDeDup (Abbas et al. 2023, arXiv:2303.09540)
SQL_GOLDEN_SIM_SEMANTIC_DEDUP_DIGEST = """
SELECT CAST(keep AS BOOLEAN) AS keep, CAST(n AS BIGINT) AS n, CAST(id_sum AS BIGINT) AS id_sum, CAST(sim_sum AS DOUBLE) AS sim_sum
FROM (VALUES
  (FALSE, 168, 52784, 64.841),
  (TRUE, 332, 71966, 96.233)
) AS t(keep, n, id_sum, sim_sum)
"""

GOLDEN_ORACLES.update({
    "sim_semantic_dedup_digest": SQL_GOLDEN_SIM_SEMANTIC_DEDUP_DIGEST,
})

# ---- batch 5 (r8): bucketed SemDeDup digest — the IVF-partitioned
# operating point a 100 TB corpus actually runs (n_lists=4 here).
# sample_fraction=1.0 trains the quantizer on the full 500-row corpus,
# so centroids, list assignment, and every greedy keep decision are a
# pure function of the parquet bytes.  Digest per (list_id, keep): a
# single assignment or keep flip moves its group's n/id_sum.
# Independent no-Spark replica: tests/test_golden_replicas.py re-derives
# the full quantizer + greedy with numpy only.
# reference semantics: SemDeDup (Abbas et al. 2023, arXiv:2303.09540)
SQL_GOLDEN_SIM_SEMANTIC_DEDUP_BUCKETED_DIGEST = """
SELECT CAST(list_id AS BIGINT) AS list_id, CAST(keep AS BOOLEAN) AS keep, CAST(n AS BIGINT) AS n, CAST(id_sum AS BIGINT) AS id_sum, CAST(sim_sum AS DOUBLE) AS sim_sum
FROM (VALUES
  (0, FALSE, 25, 8526, 9.647),
  (0, TRUE, 125, 30766, 32.836),
  (1, FALSE, 23, 7393, 8.982),
  (1, TRUE, 105, 22559, 28.357),
  (2, FALSE, 18, 5259, 7.072),
  (2, TRUE, 86, 21505, 22.292),
  (3, FALSE, 23, 6773, 8.691),
  (3, TRUE, 95, 21969, 24.894)
) AS t(list_id, keep, n, id_sum, sim_sum)
"""

GOLDEN_ORACLES.update({
    "sim_semantic_dedup_bucketed_digest": SQL_GOLDEN_SIM_SEMANTIC_DEDUP_BUCKETED_DIGEST,
})

# ---- batch 6 (r8): deflate-compression-ratio quality digest.  zlib is
# not SQL-expressible; the registered query digests the per-document
# ratio/keep table per verdict (any single ratio change or keep flip
# moves id_sum/bytes_sum/ratio_sum).  Independent no-Spark replica:
# tests/test_golden_replicas.py recomputes every ratio from parquet with
# a plain zlib loop.  reference semantics: compression-ratio filtering
# as in RefinedWeb (Penedo et al. 2023) / MassiveText (Rae et al. 2021)
SQL_GOLDEN_TEXT_COMPRESSION_RATIO_DIGEST = """
SELECT CAST(keep AS BOOLEAN) AS keep, CAST(n AS BIGINT) AS n, CAST(id_sum AS BIGINT) AS id_sum, CAST(bytes_sum AS BIGINT) AS bytes_sum, CAST(ratio_sum AS DOUBLE) AS ratio_sum
FROM (VALUES
  (FALSE, 2, 126, 1050, 0.796),
  (TRUE, 498, 124624, 148124, 276.443)
) AS t(keep, n, id_sum, bytes_sum, ratio_sum)
"""

GOLDEN_ORACLES.update({
    "text_compression_ratio_digest": SQL_GOLDEN_TEXT_COMPRESSION_RATIO_DIGEST,
})

# ---- batch 8 (r10): greedy k-center diversity sampling digest.  The
# farthest-point greedy is order-sequential (each pick conditions on all
# earlier picks), so no ANSI-SQL oracle exists; determinism is by
# construction (full-corpus quantizer training at the registered
# operating point, id-sorted greedy with first-max tie-break) and the
# independent no-Spark replica in tests/test_golden_replicas.py
# re-derives this exact pin from the parquet bytes.
# reference semantics: north-star surface (Sener & Savarese 2018 core-set
# greedy); quota apportionment = operators/sampling.py mixture_quotas.
SQL_GOLDEN_SIM_DIVERSITY_DIGEST = """
SELECT CAST(list_id AS BIGINT) AS list_id, CAST(n_sel AS BIGINT) AS n_sel, CAST(id_sum AS BIGINT) AS id_sum, CAST(dist_sum AS DOUBLE) AS dist_sum
FROM (VALUES
  (0, 18, 4833, 15.906),
  (1, 15, 3728, 13.411),
  (2, 13, 3041, 11.913),
  (3, 14, 3671, 12.453)
) AS t(list_id, n_sel, id_sum, dist_sum)
"""

GOLDEN_ORACLES.update({
    "sim_diversity_digest": SQL_GOLDEN_SIM_DIVERSITY_DIGEST,
})

# ---- batch 9 (r14): ANN index recall@k certificate.  The approximate
# probe's recall has no ANSI-SQL oracle (IVF centroids come from the
# driver-side Lloyd training); determinism is by construction — hash-
# sampled id-sorted training, argsort probe selection, rounded-score
# window top-k, and the certificate itself folds micro-averaged
# INTEGER ratios (sum(hits)/sum(exact)), so the values are
# bit-identical across sessions (asserted by the auto-parametrized
# cross-session check in tests/test_golden_oracles.py).  The full-probe
# row (n_probes = n_lists = 16) is the in-plan self-check: recall is
# exactly 1.0 by exhaustiveness, pinned here so any probe-pruning
# regression breaks the hash.
# reference semantics: north-star surface (IVF-flat recall certification).
SQL_GOLDEN_SIM_INDEX_RECALL = """
SELECT CAST(n_probes AS BIGINT) AS n_probes, CAST(n_queries AS BIGINT) AS n_queries, CAST(n_exact AS BIGINT) AS n_exact, CAST(n_hit AS BIGINT) AS n_hit, CAST(recall AS DOUBLE) AS recall, CAST(min_recall AS DOUBLE) AS min_recall
FROM (VALUES
  (1, 50, 250, 57, 0.228, 0.0),
  (2, 50, 250, 102, 0.408, 0.0),
  (4, 50, 250, 148, 0.592, 0.0),
  (8, 50, 250, 205, 0.82, 0.2),
  (16, 50, 250, 250, 1.0, 1.0)
) AS t(n_probes, n_queries, n_exact, n_hit, recall, min_recall)
"""

GOLDEN_ORACLES.update({
    "sim_index_recall": SQL_GOLDEN_SIM_INDEX_RECALL,
})
