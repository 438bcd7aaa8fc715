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
