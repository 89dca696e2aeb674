/* Clean-room prototype header for the three LZ4 entry points used by the
 * reference library. The system image ships liblz4.so.1 (1.9.4) but not the
 * development header. Signatures follow the public LZ4 API documentation. */
#pragma once

#ifdef __cplusplus
extern "C" {
#endif

int LZ4_compressBound(int inputSize);
int LZ4_compress_default(const char* src, char* dst, int srcSize, int dstCapacity);
int LZ4_decompress_safe(const char* src, char* dst, int compressedSize, int dstCapacity);

#ifdef __cplusplus
}
#endif
