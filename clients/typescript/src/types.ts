/**
 * Typed DTOs for the KektorDB-TPU REST API (reference:
 * clients/typescript/src/types.ts — request/response shapes mirroring the
 * server field names: index_name, query_vector, relation_type, ...).
 */

export interface SearchHit {
  id: string;
  score?: number;
  distance?: number;
  metadata?: Record<string, unknown>;
  edges?: EdgeInfo[];
}

export interface SearchResponse {
  results: SearchHit[];
  ids: string[];
}

export interface EdgeInfo {
  relation: string;
  target: string;
  weight?: number;
  props?: Record<string, unknown>;
  created_at?: number;
}

export interface IncomingEdgeInfo {
  relation: string;
  source: string;
  created_at?: number;
}

export interface GraphFilter {
  root_id: string;
  depth?: number;
  relation?: string;
}

export interface SearchOptions {
  filter?: string;
  textQuery?: string;
  alpha?: number;
  efSearch?: number;
  graphFilter?: GraphFilter;
  hydrate?: boolean;
  hydrateRelations?: boolean;
}

export interface CreateIndexOptions {
  metric?: "euclidean" | "cosine" | string;
  precision?: "float32" | "bfloat16" | "int8" | string;
  m?: number;
  efConstruction?: number;
  efSearch?: number;
  textLanguage?: string;
  /** Row-shard the index over N devices (TPU-native scaling surface). */
  shards?: number;
  /** hnsw (graph), flat (exact scan), host (host-RAM arena — capacity
   *  beyond HBM, chunk-streamed device scan). */
  kind?: "hnsw" | "flat" | "host" | string;
  /** auto (scan-serve + graph), scan (no graph), beam (graph traversal). */
  serveMode?: "auto" | "scan" | "beam" | string;
  /** Opt-in PCA-projected pass A: scan a [N, p] projection then re-rank
   *  exactly in full dim. Only for spectrally-decaying corpora. */
  serveProjDim?: number;
  serveProjRerank?: number;
}

export interface IndexInfo {
  name: string;
  metric: string;
  precision: string;
  vector_count: number;
  dimensions?: number;
  deleted?: number;
  needs_refine?: boolean;
  config?: Record<string, unknown>;
  memory?: MemoryConfig;
}

export interface VectorItem {
  id: string;
  vector: number[];
  metadata?: Record<string, unknown>;
}

export interface LayerConfig {
  decay_half_life?: number;
  pinned_by_default?: boolean;
}

export interface MemoryConfig {
  enabled?: boolean;
  decay_half_life?: number;
  decay_model?: "exponential" | "linear" | "step" | "ebbinghaus" | string;
  layers?: Record<string, LayerConfig>;
}

export interface SubgraphResponse {
  root: string;
  nodes: string[];
  edges: { source: string; relation: string; target: string; weight?: number }[];
}

export interface BeliefState {
  state: "crystallized" | "volatile" | "contested" | string;
  confidence: number;
  consensus?: number;
  stability?: number;
  friction?: number;
  caveat?: string;
}

export interface TaskStatus {
  id?: string;
  status: "pending" | "running" | "completed" | "failed" | string;
  result?: unknown;
  error?: string;
}

export interface ApiKeyInfo {
  id: string;
  role: "admin" | "write" | "read" | string;
  namespaces?: string[];
  name?: string;
  token?: string;
}

export interface SystemStats {
  indexes: Record<string, IndexInfo>;
  kv_keys: number;
  graph_nodes: number;
  dirty_ops: number;
  events_dropped: number;
}
